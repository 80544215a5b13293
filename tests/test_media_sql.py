"""Twin tests for the generated multimodal oracle SQL (media_sql.py).

The oracle generators mirror kernel constants and numpy pooling
conventions by value (importing them would be circular); these tests pin
the mirrors to the real definitions, and bit-check each generated hash
expression against the Python kernels through DuckDB alone — no Spark
session needed, so the exactness argument (integer comparisons == float
comparisons on the stub's dyadic rationals) is verified at every run.
"""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
import pytest

from tank_spark.llm import media_sql


def test_constants_mirror_kernels():
    from tank_spark.llm import audio, multimodal, video

    assert media_sql.FAKE_W == multimodal.FAKE_W
    assert media_sql.FAKE_H == multimodal.FAKE_H
    assert media_sql.PHASH_BANDS == multimodal.PHASH_BANDS
    assert media_sql.PHASH_HAM_T == multimodal.PHASH_HAM_T
    assert media_sql.PHASH_BUCKET_CAP == multimodal.PHASH_BUCKET_CAP
    assert media_sql.VARIANT_OFFSET == multimodal.VARIANT_OFFSET
    assert media_sql.RESIZE_W == multimodal.RESIZE_W
    assert media_sql.RESIZE_H == multimodal.RESIZE_H
    assert media_sql.PCM_BLOCKS == audio.PCM_BLOCKS
    assert media_sql.PCM_BLOCK_LEN == audio.PCM_BLOCK_LEN
    assert media_sql.FP_WINDOWS == audio.FP_WINDOWS
    assert media_sql.RESAMPLE_OUT == audio.RESAMPLE_OUT
    assert media_sql.N_FRAMES_STUB == video.N_FRAMES_STUB
    assert media_sql.SCENE_LEN == video.SCENE_LEN
    assert media_sql.SCENE_ROLL == video.SCENE_ROLL
    assert media_sql.CUT_HAM_T == video.CUT_HAM_T


def test_lin_bounds_match_numpy_linspace():
    """_lin_bounds must reproduce np.linspace(...).astype(int) for every
    pooling configuration the kernels use — the SQL weights are computed
    from these bounds, so a truncation divergence would silently shift a
    pooling boundary."""
    configs = [
        (media_sql.FAKE_W, 9),            # dHash cols
        (media_sql.FAKE_H, 8),            # dHash rows
        (media_sql.N_SAMPLES, media_sql.FP_WINDOWS),   # audio windows
        (media_sql.FAKE_H, media_sql.RESIZE_H),        # resize rows
        (media_sql.FAKE_W, media_sql.RESIZE_W),        # resize cols
        (media_sql.N_SAMPLES, media_sql.RESAMPLE_OUT),  # resample
    ]
    for total, n in configs:
        got = media_sql._lin_bounds(total, n)
        want = list(np.linspace(0, total, n + 1).astype(int))
        assert got == want, (total, n)


def _payload(text: str) -> bytes:
    return (hashlib.md5(text.encode()).digest()
            + hashlib.md5((text + ":1").encode()).digest())


def _tweak(p: bytes, idx: int, delta: int) -> bytes:
    b = bytearray(p)
    b[idx] = (b[idx] + delta) % 256
    return bytes(b)


@pytest.fixture(scope="module")
def con(tmp_path_factory):
    """DuckDB with a tiny documents view: 12 docs covering all three
    modalities plus every planted-variant selector (doc_id % 15)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("msql")
    ids = list(range(12)) + [15, 16, 17]
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "source": pa.array(["s"] * len(ids)),
        "lang": pa.array(["en"] * len(ids)),
        "text": pa.array([f"media sql twin doc {i}" for i in ids]),
    })
    pq.write_table(tbl, str(d / "documents.parquet"))
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    yield c
    c.close()


def _texts(con) -> dict[int, str]:
    return dict(con.execute("SELECT doc_id, text FROM documents").fetchall())


def test_sql_dhash_matches_kernel(con):
    from tank_spark.llm.multimodal import _luma_plane_stub, dhash64

    rows = con.execute(
        f"WITH {media_sql.IMG_HASH_CTES} SELECT doc_id, phash FROM img_hash"
    ).fetchall()
    texts = _texts(con)
    assert len(rows) == 7  # 5 images (0,3,6,9,15) + variants of 0 and 15
    vo = media_sql.VARIANT_OFFSET
    for doc_id, ph in rows:
        p = (_tweak(_payload(texts[doc_id - vo]), 7, 8) if doc_id >= vo
             else _payload(texts[doc_id]))
        assert ph == dhash64(_luma_plane_stub(p)), doc_id


def test_sql_audio_fp_matches_kernel(con):
    from tank_spark.llm.audio import _pcm_stub, audio_fingerprint64

    rows = con.execute(
        f"WITH {media_sql.AUD_HASH_CTES} SELECT doc_id, phash FROM aud_hash"
    ).fetchall()
    texts = _texts(con)
    vo = media_sql.VARIANT_OFFSET
    assert len(rows) == 7  # 5 audio (1,4,7,10,16) + variants of 1 and 16
    for doc_id, ph in rows:
        p = (_tweak(_payload(texts[doc_id - vo]), 15, 4) if doc_id >= vo
             else _payload(texts[doc_id]))
        assert ph == audio_fingerprint64(_pcm_stub(p)[0]), doc_id


def test_sql_video_signature_matches_kernel(con):
    from tank_spark.llm.video import frame_hashes, video_signature64

    rows = con.execute(
        f"WITH {media_sql.VID_HASH_CTES} SELECT doc_id, phash FROM vid_hash"
    ).fetchall()
    texts = _texts(con)
    vo = media_sql.VARIANT_OFFSET
    assert len(rows) == 7  # 5 video (2,5,8,11,17) + variants of 2 and 17
    for doc_id, ph in rows:
        p = (_tweak(_payload(texts[doc_id - vo]), 11, 8) if doc_id >= vo
             else _payload(texts[doc_id]))
        assert ph == video_signature64(frame_hashes(p)[0]), doc_id


def test_sql_thumbnail_hex_matches_kernel(con):
    from tank_spark.llm.multimodal import (
        RESIZE_H, RESIZE_W, _luma_plane_stub, block_mean_resize)

    rows = con.execute(
        f"WITH {media_sql.MH_CTE} SELECT doc_id, {media_sql._thumb_hex(0)} "
        "FROM mh WHERE doc_id % 3 = 0"
    ).fetchall()
    texts = _texts(con)
    for doc_id, hx in rows:
        plane = _luma_plane_stub(_payload(texts[doc_id]))
        want = block_mean_resize(plane, RESIZE_H, RESIZE_W).tobytes().hex()
        assert hx == want, doc_id


def test_sql_resample_hex_matches_kernel(con):
    from tank_spark.llm.audio import _pcm_stub, block_mean_resample

    rows = con.execute(
        f"WITH {media_sql.MH_CTE}, {media_sql.MB_CTE} "
        f"SELECT doc_id, {media_sql._RESAMPLE_HEX} FROM mb WHERE doc_id % 3 = 1"
    ).fetchall()
    texts = _texts(con)
    for doc_id, hx in rows:
        x, _ = _pcm_stub(_payload(texts[doc_id]))
        want = block_mean_resample(x, media_sql.RESAMPLE_OUT).tobytes().hex()
        assert hx == want, doc_id

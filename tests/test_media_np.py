"""Bit-exactness pins for the vectorized media hash twins (media_np):
every batch function must equal its scalar reference over the FULL
derived corpus — base payloads, planted variants, the incremental
fixture's byte-tweaked near-dups, and fresh-crawl payloads — plus the
packing/edge corners. Pure numpy vs pure Python; no Spark session."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest


def _corpus_payloads(n: int = 400) -> list[bytes]:
    """Deterministic payloads shaped like every fixture in the repo:
    the media_df keystream, the ':f' fresh-crawl keystream, and the
    three modality byte-tweaks applied to each."""
    pays = []
    for i in range(n):
        seed = f"doc-{i}"
        for tag in ("", ":f"):
            p = (hashlib.md5((seed + tag).encode()).digest()
                 + hashlib.md5((seed + tag + ":1").encode()).digest())
            pays.append(p)
            for idx0, delta in ((7, 8), (15, 4), (11, 8)):
                b = bytearray(p)
                b[idx0] = (b[idx0] + delta) % 256
                pays.append(bytes(b))
    return pays


def _grid(pays: list[bytes]) -> np.ndarray:
    return np.frombuffer(b"".join(p[:32] for p in pays),
                         dtype=np.uint8).reshape(-1, 32)


def test_dhash64_batch_matches_scalar():
    from tank_spark.llm import media_np
    from tank_spark.llm.multimodal import _luma_plane_stub, dhash64

    pays = _corpus_payloads()
    got = media_np.dhash64_batch(_grid(pays).reshape(-1, 4, 8))
    want = [dhash64(_luma_plane_stub(p)) for p in pays]
    assert got.tolist() == want


def test_fingerprint64_batch_matches_scalar():
    from tank_spark.llm import media_np
    from tank_spark.llm.audio import _pcm_stub, audio_fingerprint64

    pays = _corpus_payloads()
    got = media_np.fingerprint64_batch(_grid(pays))
    want = [audio_fingerprint64(_pcm_stub(p)[0]) for p in pays]
    assert got.tolist() == want


def test_signature64_batch_matches_scalar():
    from tank_spark.llm import media_np
    from tank_spark.llm.video import (
        _frames_stub, frame_hashes, video_signature64)
    from tank_spark.llm.multimodal import dhash64

    pays = _corpus_payloads()
    got = media_np.signature64_batch(_grid(pays))
    want = []
    for p in pays:
        hs = [dhash64(f) for f in _frames_stub(p)[0]]
        want.append(video_signature64(hs))
    assert got.tolist() == want
    # the strict-majority identity the batch form relies on holds on
    # real frame_hashes output too (decode dispatch included)
    hs, _ = frame_hashes(pays[0])
    assert video_signature64(hs) == got[0]


def test_pack_bits64_msb_first_and_twos_complement():
    from tank_spark.llm import media_np

    bits = np.zeros((3, 64), dtype=bool)
    bits[0, 0] = True            # MSB set -> negative two's complement
    bits[1, 63] = True           # LSB set -> 1
    # row 2: alternating, reference via the scalar shift loop
    bits[2] = (np.arange(64) % 2).astype(bool)
    code = 0
    for b in bits[2]:
        code = (code << 1) | int(b)
    if code >= 1 << 63:
        code -= 1 << 64
    got = media_np._pack_bits64(bits)
    assert got[0] == -(1 << 63)
    assert got[1] == 1
    assert got[2] == code


def test_hash_frame_drop_and_dispatch_semantics():
    import pandas as pd

    from tank_spark.llm import media_np

    calls = []

    def scalar(p: bytes) -> int:
        calls.append(p)
        if len(p) < 40:
            raise ValueError("bad container")
        return 7

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "payload": [b"x" * 32,            # stub row
                    b"R" * 16,            # too short -> dropped
                    b"REAL" + b"y" * 40,  # real container -> scalar ok
                    b"REAL" + b"z" * 8],  # real container -> raises -> drop
    })
    out = media_np.hash_frame(
        pdf,
        lambda b: np.full(len(b), 5, dtype=np.int64),
        scalar,
        lambda p: p[:4] == b"REAL",
    )
    got = dict(zip(out["doc_id"], out["phash"]))
    assert got == {1: 5, 3: 7}
    assert len(calls) == 2  # only the real-container rows hit scalar


@pytest.mark.parametrize("fn", ["dhash", "fingerprint", "signature"])
def test_batch_fns_empty_input(fn):
    from tank_spark.llm import media_np

    b = np.zeros((0, 32), dtype=np.uint8)
    if fn == "dhash":
        out = media_np.dhash64_batch(b.reshape(0, 4, 8))
    elif fn == "fingerprint":
        out = media_np.fingerprint64_batch(b)
    else:
        out = media_np.signature64_batch(b)
    assert out.shape == (0,) and out.dtype == np.int64


# ---- property tests: arbitrary payload bytes, not just fixture shapes

from hypothesis import given, settings, strategies as st  # noqa: E402

_PAYLOAD = st.binary(min_size=32, max_size=64)


@settings(max_examples=150, deadline=None)
@given(st.lists(_PAYLOAD, min_size=1, max_size=20))
def test_dhash_batch_matches_scalar_on_arbitrary_bytes(pays):
    from tank_spark.llm import media_np
    from tank_spark.llm.multimodal import _luma_plane_stub, dhash64

    got = media_np.dhash64_batch(_grid(pays).reshape(-1, 4, 8)).tolist()
    assert got == [dhash64(_luma_plane_stub(p)) for p in pays]


@settings(max_examples=150, deadline=None)
@given(st.lists(_PAYLOAD, min_size=1, max_size=20))
def test_fingerprint_batch_matches_scalar_on_arbitrary_bytes(pays):
    from tank_spark.llm import media_np
    from tank_spark.llm.audio import _pcm_stub, audio_fingerprint64

    got = media_np.fingerprint64_batch(_grid(pays)).tolist()
    assert got == [audio_fingerprint64(_pcm_stub(p)[0]) for p in pays]


@settings(max_examples=100, deadline=None)
@given(st.lists(_PAYLOAD, min_size=1, max_size=12))
def test_signature_batch_matches_scalar_on_arbitrary_bytes(pays):
    from tank_spark.llm import media_np
    from tank_spark.llm.multimodal import dhash64
    from tank_spark.llm.video import _frames_stub, video_signature64

    got = media_np.signature64_batch(_grid(pays)).tolist()
    want = [video_signature64([dhash64(f) for f in _frames_stub(p)[0]])
            for p in pays]
    assert got == want

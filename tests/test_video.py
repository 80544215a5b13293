"""Video operators: decode dispatch (real Y4M parse vs scene-structured
stub), scene-cut detection, temporal-fingerprint near-dup, keyframe
thumbnails — the video side of the multimodal pillar
(tank_spark/llm/video.py).

The twin functions here are INDEPENDENT pure-Python reimplementations
(not calls into the module) so a bug in the numpy kernels cannot
self-certify."""

from __future__ import annotations

import hashlib
import math

import pytest


def pay(seed: str) -> bytes:
    """A synthetic 32-byte payload exactly as media_df derives them."""
    return (hashlib.md5(seed.encode()).digest()
            + hashlib.md5((seed + ":1").encode()).digest())


def make_y4m(frames, w, h, fps=(25, 1), cs="mono") -> bytes:
    """A GENUINE YUV4MPEG2 container, assembled per the public spec:
    plain-text stream header, FRAME marker per frame, raw planes."""
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{cs}\n"
    blob = head.encode("ascii")
    for y in frames:
        blob += b"FRAME\n" + bytes(y)
        if cs.startswith("420"):
            blob += bytes((w // 2) * (h // 2)) * 2   # flat chroma planes
    return blob


# ------------------------------------------------------ pure-Python twins

def _plane_twin(payload: bytes):
    """24x32 block-tiled luma plane (the image stub's tiling)."""
    return [[payload[(r // 6) * 8 + (c // 4)] for c in range(32)]
            for r in range(24)]


def _dhash_twin_plane(plane) -> int:
    h, w = len(plane), len(plane[0])
    rb = [math.floor(i * h / 8) for i in range(9)]
    cb = [math.floor(i * w / 9) for i in range(10)]
    g = [[sum(plane[r][c] for r in range(rb[i], rb[i + 1])
              for c in range(cb[j], cb[j + 1]))
          / ((rb[i + 1] - rb[i]) * (cb[j + 1] - cb[j]))
          for j in range(9)] for i in range(8)]
    code = 0
    for i in range(8):
        for j in range(8):
            code = (code << 1) | (1 if g[i][j + 1] > g[i][j] else 0)
    return code  # unsigned


def _frame_hashes_twin(p: bytes) -> list:
    """Per-frame dHash of the 12 stub frames (3 scenes x 4 frames, each
    scene a 7-byte left rotation of the payload)."""
    hs = []
    for i in range(12):
        k = (7 * (i // 4)) % 32
        hs.append(_dhash_twin_plane(_plane_twin(p[k:32] + p[:k])))
    return hs


def _cuts_twin(hs) -> list:
    return [(i, bin(hs[i] ^ hs[i - 1]).count("1"))
            for i in range(1, len(hs))
            if bin(hs[i] ^ hs[i - 1]).count("1") >= 12]


def _sig_twin(p: bytes) -> int:
    hs = _frame_hashes_twin(p)
    code = 0
    for bit in range(63, -1, -1):
        cnt = sum((h >> bit) & 1 for h in hs)
        code = (code << 1) | (1 if 2 * cnt > len(hs) else 0)
    return code - (1 << 64) if code >= 1 << 63 else code


# --------------------------------------------------------------- decode

def test_stub_frames_scene_structure_and_locality():
    import numpy as np

    from tank_spark.llm.video import N_FRAMES_STUB, VIDEO_STUB_FPS, _frames_stub

    p = pay("vidA")
    frames, fps = _frames_stub(p)
    assert fps == VIDEO_STUB_FPS and len(frames) == N_FRAMES_STUB
    # frames within a scene are identical; scenes differ
    for s in range(3):
        base = frames[s * 4]
        for i in range(1, 4):
            assert np.array_equal(frames[s * 4 + i], base)
    assert not np.array_equal(frames[0], frames[4])
    assert not np.array_equal(frames[4], frames[8])
    # locality: a 1-byte tweak perturbs exactly one block of every frame
    q = p[:12] + bytes([(p[12] + 8) % 256]) + p[13:]
    qframes, _ = _frames_stub(q)
    for f, qf in zip(frames, qframes):
        assert (f != qf).sum() == 6 * 4   # one 6x4 block
    with pytest.raises(ValueError):
        _frames_stub(b"short")


def test_real_y4m_mono_and_420():
    import numpy as np

    from tank_spark.llm.video import decode_frames

    f0 = bytes(range(64)) * 6            # 16x24 plane
    f1 = bytes(reversed(f0))
    blob = make_y4m([f0, f1], w=24, h=16, fps=(30, 1))
    frames, fps = decode_frames(blob)
    assert fps == 30.0 and len(frames) == 2
    assert frames[0].shape == (16, 24)
    assert np.array_equal(
        frames[0], np.frombuffer(f0, dtype=np.uint8).reshape(16, 24))
    # C420: Y plane leads, chroma skipped
    blob420 = make_y4m([f0], w=24, h=16, cs="420jpeg")
    frames420, _ = decode_frames(blob420)
    assert np.array_equal(frames420[0], frames[0])


def test_y4m_roundtrip_property():
    """Property: any mono Y4M container we assemble parses back to
    exactly the frames and fps that went in (dims, byte values, frame
    count, rational rates)."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 40), h=st.integers(1, 40),
        n=st.integers(1, 4), num=st.integers(1, 60), den=st.integers(1, 4),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(w, h, n, num, den, seed):
        from tank_spark.llm.video import decode_frames

        rng = np.random.RandomState(seed)
        frames = [rng.randint(0, 256, size=h * w, dtype=np.uint8).tobytes()
                  for _ in range(n)]
        got, fps = decode_frames(make_y4m(frames, w=w, h=h, fps=(num, den)))
        assert fps == num / den and len(got) == n
        for f, raw in zip(got, frames):
            assert f.shape == (h, w)
            assert np.array_equal(
                f, np.frombuffer(raw, dtype=np.uint8).reshape(h, w))

    check()


def test_y4m_errors_become_valueerror():
    from tank_spark.llm.video import decode_frames

    good = make_y4m([bytes(384)], w=24, h=16)
    with pytest.raises(ValueError):      # truncated frame
        decode_frames(good[:-10])
    with pytest.raises(ValueError):      # unsupported colorspace
        decode_frames(make_y4m([bytes(384)], w=24, h=16, cs="444"))
    with pytest.raises(ValueError):      # no frames at all
        decode_frames(b"YUV4MPEG2 W24 H16 F25:1\n")
    with pytest.raises(ValueError):      # missing dimensions
        decode_frames(b"YUV4MPEG2 F25:1\nFRAME\n")
    # crafted zero frame-rate denominator must be ValueError, NOT
    # ZeroDivisionError — anything else escapes the kernels'
    # except-ValueError in-band error contract and fails the whole
    # Spark task (ADVICE r7)
    with pytest.raises(ValueError):
        decode_frames(b"YUV4MPEG2 W24 H16 F30:0 Cmono\nFRAME\n" + bytes(384))
    with pytest.raises(ValueError):      # non-numeric rate token
        decode_frames(b"YUV4MPEG2 W24 H16 Fx:y Cmono\nFRAME\n" + bytes(384))


def test_dispatch_y4m_vs_stub():
    from tank_spark.llm.video import VIDEO_STUB_FPS, decode_frames

    _, fps = decode_frames(make_y4m([bytes(384)], w=24, h=16, fps=(24, 1)))
    assert fps == 24.0                   # real parse reached
    _, fps = decode_frames(pay("x"))
    assert fps == VIDEO_STUB_FPS         # stub reached


# ----------------------------------------------------------- scene cuts

def test_frame_hashes_and_cuts_match_twin():
    from tank_spark.llm.video import frame_hashes, scene_cut_indices

    for i in range(25):
        p = pay(f"cut{i}")
        hs, _ = frame_hashes(p)
        assert [h & (2**64 - 1) for h in hs] == _frame_hashes_twin(p), i
        assert scene_cut_indices(hs) == _cuts_twin(_frame_hashes_twin(p)), i


def test_stub_cuts_land_exactly_at_scene_boundaries():
    """Measured contract: the scene rotation always crosses the
    threshold, in-scene deltas never do — cuts are exactly {4, 8}."""
    from tank_spark.llm.video import frame_hashes, scene_cut_indices

    for i in range(60):
        hs, _ = frame_hashes(pay(f"b{i}"))
        assert [fi for fi, _ in scene_cut_indices(hs)] == [4, 8], f"payload {i}"


def test_scene_cut_kernel_rows_and_error_drop():
    import pandas as pd

    from tank_spark.llm.video import _scene_cut_kernel

    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [pay("k"), b"xx"]})
    out = pd.concat(_scene_cut_kernel(iter([pdf])))
    assert set(out["doc_id"]) == {1}     # undecodable row dropped
    assert list(out["frame_idx"]) == [4, 8]
    assert list(out["cut_idx"]) == [0, 1]
    assert list(out["ts_ms"]) == [1000, 2000]   # 4 fps stub cadence
    assert (out["hamming"] >= 12).all()


def test_scene_cuts_on_real_y4m_row():
    """A genuine Y4M payload inside the kernel takes the REAL parse:
    a flat->bright frame change is a cut at the container's own fps."""
    import pandas as pd

    from tank_spark.llm.video import _scene_cut_kernel

    flat = bytes(384)
    grad = bytes((i % 24) * 11 for i in range(384))   # strong columns
    blob = make_y4m([flat, flat, grad, grad], w=24, h=16, fps=(2, 1))
    pdf = pd.DataFrame({"doc_id": [9], "payload": [blob]})
    out = pd.concat(_scene_cut_kernel(iter([pdf])))
    assert list(out["frame_idx"]) == [2]
    assert list(out["ts_ms"]) == [1000]  # frame 2 at 2 fps


# ---------------------------------------------------- temporal signature

def test_signature_matches_pure_python_twin():
    from tank_spark.llm.video import frame_hashes, video_signature64

    for i in range(40):
        p = pay(f"sig{i}")
        hs, _ = frame_hashes(p)
        assert video_signature64(hs) == _sig_twin(p), f"payload {i}"


def test_signature_locality_and_separation():
    """The planted-variant tweak (+8 on one byte) must stay within the
    Hamming<=3 catch radius for most videos; unrelated videos must sit
    far apart (same measured-separation contract as image/audio)."""
    hams = []
    for i in range(60):
        p = pay(f"loc{i}")
        q = p[:11] + bytes([(p[11] + 8) % 256]) + p[12:]
        d = (_sig_twin(p) ^ _sig_twin(q)) & (2**64 - 1)
        hams.append(bin(d).count("1"))
    assert sum(1 for h in hams if h <= 3) >= 50   # most caught
    far = bin((_sig_twin(pay("a")) ^ _sig_twin(pay("b"))) & (2**64 - 1)).count("1")
    assert far >= 12


def test_signature_empty_raises():
    from tank_spark.llm.video import video_signature64

    with pytest.raises(ValueError):
        video_signature64([])


def test_video_neardup_recovers_exactly_the_twin_pair_set(spark):
    """E2E at SF_DIR: the Spark pair set equals the pure-Python
    prediction (all pairs at true Hamming<=3 over base videos + planted
    variants — pigeonhole banding guarantees no misses below threshold,
    exact bit_count verify guarantees no extras)."""
    from tests.conftest import SF_DIR

    from tank_spark.llm.video import VIDEO_VARIANT_OFFSET, video_phash_neardup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text").collect()
    sigs = {}
    for r in docs:
        if r.doc_id % 3 != 2:
            continue
        p = (hashlib.md5(r.text.encode()).digest()
             + hashlib.md5((r.text + ":1").encode()).digest())
        sigs[r.doc_id] = _sig_twin(p)
        if r.doc_id % 15 == 2:
            q = p[:11] + bytes([(p[11] + 8) % 256]) + p[12:]
            sigs[r.doc_id + VIDEO_VARIANT_OFFSET] = _sig_twin(q)
    ids = sorted(sigs)
    want = {
        (a, b, bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1"))
        for i, a in enumerate(ids) for b in ids[i + 1:]
        if bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1") <= 3
    }
    got = {(r.doc_a, r.doc_b, r.hamming)
           for r in video_phash_neardup(spark, SF_DIR).collect()}
    assert got == want
    assert len(want) >= 20    # the plant produces a real pair population


def test_video_pair_plan_never_goes_cartesian(spark):
    from tests.conftest import SF_DIR

    from tank_spark.llm.video import video_phash_neardup

    plan = video_phash_neardup(spark, SF_DIR)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------------------ keyframes

def test_keyframe_kernel_thumbs_match_resize_twin():
    import numpy as np
    import pandas as pd

    from tank_spark.llm.video import (
        _frames_stub, _keyframe_kernel, block_mean_resize)

    p = pay("kf")
    pdf = pd.DataFrame({"doc_id": [3], "payload": [p]})
    out = pd.concat(_keyframe_kernel(iter([pdf])))
    # 3 stub scenes -> 3 keyframes at scene starts
    assert list(out["scene_idx"]) == [0, 1, 2]
    assert list(out["frame_idx"]) == [0, 4, 8]
    assert list(out["ts_ms"]) == [0, 1000, 2000]
    frames, _ = _frames_stub(p)
    for _, row in out.iterrows():
        want = block_mean_resize(frames[row["frame_idx"]], 8, 16).tobytes()
        assert bytes(row["thumb"]) == want
        assert len(row["thumb"]) == 8 * 16
    # thumbnails of different scenes differ (the rotation moved blocks)
    thumbs = [bytes(t) for t in out["thumb"]]
    assert len(set(thumbs)) == 3
    # undecodable drops
    bad = pd.DataFrame({"doc_id": [4], "payload": [b"zz"]})
    assert len(pd.concat(_keyframe_kernel(iter([bad])))) == 0
    del np  # imported for parity with sibling tests


def test_video_e2e_rows(spark):
    """Registered queries over the derived video slice: 2 cuts and 3
    keyframes per synthetic video, no drops on the synthetic corpus."""
    from tests.conftest import SF_DIR

    from tank_spark.llm.video import video_keyframes, video_scene_cuts, video_slice

    n_vid = video_slice(spark, SF_DIR).count()
    assert n_vid > 0
    cuts = video_scene_cuts(spark, SF_DIR)
    assert cuts.count() == 2 * n_vid
    kf = video_keyframes(spark, SF_DIR)
    assert kf.count() == 3 * n_vid

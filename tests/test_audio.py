"""Audio operators: decode dispatch, feature twins, fingerprint
near-dup, resample — the audio side of the multimodal pillar
(tank_spark/llm/audio.py).

The twin functions here are INDEPENDENT pure-Python reimplementations
(not calls into the module) so a bug in the numpy kernels cannot
self-certify."""

from __future__ import annotations

import hashlib
import io
import math
import wave

import pytest


def pay(seed: str) -> bytes:
    """A synthetic 32-byte payload exactly as media_df derives them."""
    return (hashlib.md5(seed.encode()).digest()
            + hashlib.md5((seed + ":1").encode()).digest())


def make_wav(samples, rate=8000, nch=1, width=2) -> bytes:
    """A GENUINE RIFF/WAVE container via the stdlib writer."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 2:
            data = b"".join(int(s).to_bytes(2, "little", signed=True)
                            for s in samples)
        elif width == 3:
            data = b"".join(int(s).to_bytes(3, "little", signed=True)
                            for s in samples)
        else:
            data = bytes(samples)
        w.writeframes(data)
    return buf.getvalue()


# ------------------------------------------------------------- decode

def test_stub_decode_block_constant_and_local():
    import numpy as np

    from tank_spark.llm.audio import PCM_BLOCK_LEN, PCM_STUB_RATE, _pcm_stub

    p = pay("clipA")
    x, rate = _pcm_stub(p)
    assert rate == PCM_STUB_RATE and len(x) == 32 * PCM_BLOCK_LEN
    # block-constant: each byte held for one block, level = (b-128)/128
    for i, b in enumerate(p):
        blk = x[i * PCM_BLOCK_LEN:(i + 1) * PCM_BLOCK_LEN]
        assert np.all(blk == (b - 128) / 128)
    # locality: a 1-byte tweak perturbs exactly one block
    q = p[:15] + bytes([(p[15] + 4) % 256]) + p[16:]
    y, _ = _pcm_stub(q)
    assert np.sum(x != y) == PCM_BLOCK_LEN
    with pytest.raises(ValueError):
        _pcm_stub(b"short")


def test_real_wav_paths_16_8_bit_and_stereo():
    import numpy as np

    from tank_spark.llm.audio import decode_pcm

    ints = [0, 16384, -16384, 32767, -32768, 100]
    x, rate = decode_pcm(make_wav(ints, rate=44100))
    assert rate == 44100
    assert np.allclose(x, np.array(ints) / 32768.0)
    # 8-bit unsigned
    x8, _ = decode_pcm(make_wav([0, 128, 255], width=1))
    assert np.allclose(x8, [(0 - 128) / 128, 0.0, (255 - 128) / 128])
    # stereo averages down to mono
    xs, _ = decode_pcm(make_wav([100, 300, -100, 500], nch=2))
    assert np.allclose(xs, [200 / 32768.0, 200 / 32768.0])


def test_wav_errors_become_valueerror():
    from tank_spark.llm.audio import decode_pcm

    with pytest.raises(ValueError):          # truncated RIFF container
        decode_pcm(make_wav([1, 2, 3])[:16])
    with pytest.raises(ValueError):          # 24-bit unsupported
        decode_pcm(make_wav([1, 2, 3], width=3))
    with pytest.raises(ValueError):          # empty stream
        decode_pcm(make_wav([]))


def test_dispatch_riff_vs_stub():
    from tank_spark.llm.audio import PCM_STUB_RATE, decode_pcm

    _, rate = decode_pcm(make_wav([1, 2, 3], rate=22050))
    assert rate == 22050                     # real parse reached
    _, rate = decode_pcm(pay("x"))
    assert rate == PCM_STUB_RATE             # stub reached


# ------------------------------------------------------------ features

def _stub_samples(p: bytes):
    """Twin of the stub decode, pure Python."""
    out = []
    for b in p[:32]:
        out.extend([(b - 128) / 128] * 128)
    return out


def _feature_twin(x, rate):
    n = len(x)
    nwin = n // 64
    silence = 0.0
    if nwin:
        quiet = sum(
            1 for i in range(nwin)
            if math.sqrt(sum(v * v for v in x[i * 64:(i + 1) * 64]) / 64) < 0.0625)
        silence = quiet / nwin
    zc = 0.0
    if n > 1:
        neg = [v < 0 or (v == 0 and math.copysign(1, v) < 0) for v in x]
        zc = sum(1 for a, b in zip(neg, neg[1:]) if a != b) / (n - 1)
    return {
        "n_samples": n, "sample_rate": rate, "duration_ms": n * 1000.0 / rate,
        "rms": math.sqrt(sum(v * v for v in x) / n),
        "peak": max(abs(v) for v in x),
        "silence_ratio": silence,
        "clip_ratio": sum(1 for v in x if abs(v) >= 127 / 128) / n,
        "zero_cross_rate": zc,
    }


def test_feature_kernel_matches_pure_python_twin():
    import pandas as pd

    from tank_spark.llm.audio import _features_kernel

    payloads = {i: pay(f"clip{i}") for i in range(20)}
    # force some clipping + silence: blocks of extreme and mid bytes
    payloads[20] = bytes([255, 0, 128, 130] * 8)
    pdf = pd.DataFrame(
        {"doc_id": list(payloads), "payload": list(payloads.values())})
    out = pd.concat(_features_kernel(iter([pdf]))).set_index("doc_id")
    assert out["decode_error"].isna().all()
    for i, p in payloads.items():
        want = _feature_twin(_stub_samples(p), 8000)
        got = out.loc[i]
        for k, v in want.items():
            assert got[k] == pytest.approx(v, abs=1e-12), (i, k)
    # the crafted payload actually exercises both ratios
    assert out.loc[20, "clip_ratio"] > 0
    assert out.loc[20, "silence_ratio"] > 0


def test_feature_kernel_error_in_band():
    import pandas as pd

    from tank_spark.llm.audio import _features_kernel

    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [b"xx", pay("ok")]})
    out = pd.concat(_features_kernel(iter([pdf]))).set_index("doc_id")
    assert out.loc[1, "decode_error"] == "corrupt payload"
    assert pd.isna(out.loc[1, "rms"])
    assert pd.isna(out.loc[2, "decode_error"])


def test_features_on_real_wav_row():
    """A genuine WAV payload inside the kernel takes the REAL parse:
    the emitted sample_rate is the container's, not the stub's."""
    import pandas as pd

    from tank_spark.llm.audio import _features_kernel

    wav = make_wav([0, 16384, -16384, 0] * 50, rate=16000)
    pdf = pd.DataFrame({"doc_id": [7], "payload": [wav]})
    out = pd.concat(_features_kernel(iter([pdf]))).iloc[0]
    assert out["sample_rate"] == 16000
    assert out["n_samples"] == 200
    assert out["rms"] == pytest.approx(math.sqrt(0.5 * 0.25), abs=1e-9)


# --------------------------------------------------------- fingerprint

def _fp_twin(p: bytes) -> int:
    x = _stub_samples(p)
    n = len(x)
    bounds = [math.floor(i * n / 65) for i in range(66)]
    e = [sum(v * v for v in x[bounds[i]:bounds[i + 1]]) / (bounds[i + 1] - bounds[i])
         for i in range(65)]
    code = 0
    for i in range(64):
        code = (code << 1) | (1 if e[i + 1] > e[i] else 0)
    return code - (1 << 64) if code >= 1 << 63 else code


def test_fingerprint_matches_pure_python_twin():
    from tank_spark.llm.audio import _pcm_stub, audio_fingerprint64

    for i in range(40):
        p = pay(f"fp{i}")
        x, _ = _pcm_stub(p)
        assert audio_fingerprint64(x) == _fp_twin(p), f"payload {i}"


def test_fingerprint_locality_and_separation():
    """The planted-variant tweak (+4 on one byte) must stay within the
    Hamming<=3 catch radius for most clips; unrelated clips must sit
    far apart (the same measured-separation contract as the image
    stub)."""
    hams = []
    for i in range(60):
        p = pay(f"loc{i}")
        q = p[:15] + bytes([(p[15] + 4) % 256]) + p[16:]
        d = (_fp_twin(p) ^ _fp_twin(q)) & (2**64 - 1)
        hams.append(bin(d).count("1"))
    assert sum(1 for h in hams if h <= 3) >= 55   # near-all caught
    far = bin((_fp_twin(pay("a")) ^ _fp_twin(pay("b"))) & (2**64 - 1)).count("1")
    assert far >= 12


def test_fingerprint_too_short_raises():
    import numpy as np

    from tank_spark.llm.audio import audio_fingerprint64

    with pytest.raises(ValueError):
        audio_fingerprint64(np.zeros(64))


def test_audio_neardup_recovers_exactly_the_twin_pair_set(spark):
    """E2E at SF_DIR: the Spark pair set equals the pure-Python
    prediction (all pairs at true Hamming<=3 over base clips + planted
    variants — the pigeonhole banding guarantees no misses below the
    threshold, and the exact bit_count verify guarantees no extras)."""
    from tests.conftest import SF_DIR

    from tank_spark.llm.audio import (
        AUDIO_VARIANT_OFFSET, audio_fingerprint_neardup)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text").collect()
    fps = {}
    for r in docs:
        if r.doc_id % 3 != 1:
            continue
        p = (hashlib.md5(r.text.encode()).digest()
             + hashlib.md5((r.text + ":1").encode()).digest())
        fps[r.doc_id] = _fp_twin(p)
        if r.doc_id % 15 == 1:
            q = p[:15] + bytes([(p[15] + 4) % 256]) + p[16:]
            fps[r.doc_id + AUDIO_VARIANT_OFFSET] = _fp_twin(q)
    ids = sorted(fps)
    want = {
        (a, b, bin((fps[a] ^ fps[b]) & (2**64 - 1)).count("1"))
        for i, a in enumerate(ids) for b in ids[i + 1:]
        if bin((fps[a] ^ fps[b]) & (2**64 - 1)).count("1") <= 3
    }
    got = {(r.doc_a, r.doc_b, r.hamming)
           for r in audio_fingerprint_neardup(spark, SF_DIR).collect()}
    assert got == want
    assert len(want) >= 30    # the plant produces a real pair population


def test_audio_pair_plan_never_goes_cartesian(spark):
    from tests.conftest import SF_DIR

    from tank_spark.llm.audio import audio_fingerprint_neardup

    plan = audio_fingerprint_neardup(spark, SF_DIR)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------------------ resample

def test_block_mean_resample_exact_values():
    import numpy as np

    from tank_spark.llm.audio import block_mean_resample

    x = np.array([-1.0, -1.0, 0.0, 0.0, 1.0, 1.0, 0.5, 0.5])
    out = block_mean_resample(x, 4)
    # block means: -1, 0, 1, 0.5 -> uint8 via (v+1)*127.5 rounded
    assert list(out) == [0, 128, 255, 191]
    with pytest.raises(ValueError):
        block_mean_resample(x, 16)           # upsample refused


def test_resample_kernel_and_error_in_band():
    import pandas as pd

    from tank_spark.llm.audio import RESAMPLE_OUT, _resample_kernel

    short_wav = make_wav([0] * 100)          # genuine WAV, 100 samples
    pdf = pd.DataFrame({"doc_id": [1, 2],
                        "payload": [pay("rs"), short_wav]})
    out = pd.concat(_resample_kernel(iter([pdf]))).set_index("doc_id")
    assert out.loc[1, "out_samples"] == RESAMPLE_OUT
    assert len(out.loc[1, "resampled"]) == RESAMPLE_OUT
    assert out.loc[1, "out_rate"] == pytest.approx(8000 * 512 / 4096)
    assert "shorter than target" in out.loc[2, "resample_error"]
    assert pd.isna(out.loc[2, "resampled"])


def test_audio_e2e_rows(spark):
    """Registered queries over the derived audio slice: one row per
    audio doc, no decode errors on the synthetic corpus."""
    from tests.conftest import SF_DIR

    from tank_spark.llm.audio import audio_features, audio_resample

    f = audio_features(spark, SF_DIR)
    n_audio = f.count()
    assert n_audio > 0
    assert f.filter("decode_error is not null").count() == 0
    r = audio_resample(spark, SF_DIR)
    assert r.count() == n_audio
    assert r.filter("resample_error is not null").count() == 0

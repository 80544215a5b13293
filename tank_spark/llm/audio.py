"""Audio columns: the audio side of the multimodal pillar.

The reference treats media as opaque blobs next to typed metadata
(SURVEY.md §2.10); this module gives the ``audio/wav`` slice the same
production-shaped treatment the image slice already has in
``multimodal.py`` — decode, windowed feature extraction, fingerprint
near-dup, resample — each as an Arrow-batched ``mapInPandas`` kernel that
is map-only over the audio slice (no shuffle until the dedup join, which
is the banded Hamming join shared with the image family).

Decode is CONTENT-DISPATCHED rather than import-guarded: the real WAV
parser is the stdlib ``wave`` module (always importable), so a payload
that actually is a RIFF/WAVE container takes the REAL parse wherever it
appears — crafted genuine WAV fixtures exercise that branch in tests —
while the synthetic md5-keystream payloads of the test corpus take the
clearly-marked deterministic stub (``_pcm_stub``): payload bytes become a
block-constant PCM signal, locality-preserving by construction (a 1-byte
payload change perturbs one 128-sample block, so near-identical payloads
give near-identical fingerprints — same posture as the image stub plane).

Scale posture: decode/feature/resample are canonical mapInPandas
workloads — map-only, Arrow moves the bytes once per batch;
``spark.sql.files.maxPartitionBytes`` (at 100 TB, the blob-store
chunking) sizes batches so a partition of blobs fits executor memory.
The fingerprint dedup never goes quadratic: it reuses
``multimodal.phash_neardup_pairs`` — the banded Hamming-ball join is
hash-agnostic, so the same capped 16-bit-band plan serves image dHash
and audio fingerprints.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tank_spark.llm import media_sql
from tank_spark.llm.multimodal import (
    VARIANT_OFFSET,
    media_df,
    phash_neardup_pairs,
)
from tank_spark.plans.registry import register

PCM_BLOCKS = 32        # one block per payload byte
PCM_BLOCK_LEN = 128    # samples per block -> 4096 samples per stub clip
PCM_STUB_RATE = 8000   # nominal stub sample rate (512 ms clips)

SILENCE_WIN = 64       # non-overlapping rms windows for silence_ratio
SILENCE_RMS = 0.0625   # a window quieter than this counts as silence
CLIP_LEVEL = 127 / 128  # |x| at or above this counts as clipped


def _pcm_stub(payload: bytes):
    """STUB decode — deterministic fake for non-RIFF payloads (the test
    corpus's md5 keystreams). Each of the first 32 bytes maps to a signed
    level in [-1, 1) held for PCM_BLOCK_LEN samples: a block-constant
    signal whose features and fingerprint are reproducible, and where a
    1-byte payload change perturbs exactly one block. Raises ValueError
    for payloads too short to decode, so the error path is real."""
    import numpy as np

    if len(payload) < PCM_BLOCKS:
        raise ValueError("corrupt payload")
    levels = (np.frombuffer(payload[:PCM_BLOCKS], dtype=np.uint8)
              .astype(np.float64) - 128.0) / 128.0
    return np.repeat(levels, PCM_BLOCK_LEN), PCM_STUB_RATE


def _pcm_wav(payload: bytes):
    """REAL decode path: stdlib ``wave`` parse of a RIFF/WAVE container
    -> float64 samples in [-1, 1) (channels averaged down to mono) and
    the container's frame rate. 8- and 16-bit PCM are supported; parse
    failures and other widths raise ValueError so they land in the
    in-band error column like any corrupt row."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload)) as w:
            nch, width, rate, nframes = (
                w.getnchannels(), w.getsampwidth(), w.getframerate(),
                w.getnframes())
            raw = w.readframes(nframes)
    except (wave.Error, EOFError) as exc:
        raise ValueError(f"decode failed: {exc}") from None
    if width == 1:       # unsigned 8-bit PCM
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:     # signed 16-bit PCM
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    else:
        raise ValueError(f"unsupported sample width: {width}")
    if nch > 1:
        x = x[: (len(x) // nch) * nch].reshape(-1, nch).mean(axis=1)
    if len(x) == 0:
        raise ValueError("empty audio stream")
    return x, rate


def decode_pcm(payload: bytes):
    """payload -> (samples float64 in [-1,1), sample_rate). Content
    dispatch: genuine RIFF/WAVE bytes take the real stdlib parse;
    anything else takes the deterministic stub."""
    if payload[:4] == b"RIFF":
        return _pcm_wav(payload)
    return _pcm_stub(payload)


def audio_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio rows of the derived media table (doc_id % 3 == 1)."""
    return (
        media_df(spark, sf_dir)
        .filter(F.col("meta.media_type") == "audio/wav")
        .select("doc_id", "payload")
    )


# ------------------------------------------------------ feature extract

AUDIO_FEATURES_SCHEMA = (
    "doc_id long, n_samples int, sample_rate int, duration_ms double, "
    "rms double, peak double, silence_ratio double, clip_ratio double, "
    "zero_cross_rate double, decode_error string"
)


def audio_feature_row(x, rate: int) -> dict:
    """Windowed signal features of one decoded clip — shared by the
    Spark kernel and the pure-numpy twin test so the definitions are
    pinned in exactly one place."""
    import numpy as np

    n = len(x)
    nwin = n // SILENCE_WIN
    silence = 0.0
    if nwin > 0:
        w = x[: nwin * SILENCE_WIN].reshape(nwin, SILENCE_WIN)
        silence = float(np.mean(np.sqrt(np.mean(w * w, axis=1)) < SILENCE_RMS))
    zc = 0.0
    if n > 1:
        zc = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return {
        "n_samples": n,
        "sample_rate": int(rate),
        "duration_ms": n * 1000.0 / rate,
        "rms": float(np.sqrt(np.mean(x * x))),
        "peak": float(np.max(np.abs(x))),
        "silence_ratio": silence,
        "clip_ratio": float(np.mean(np.abs(x) >= CLIP_LEVEL)),
        "zero_cross_rate": zc,
    }


def _features_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload) -> feature row per clip,
    decode failures in-band (decode_error set, features null)."""
    cols = ["doc_id", "n_samples", "sample_rate", "duration_ms", "rms",
            "peak", "silence_ratio", "clip_ratio", "zero_cross_rate",
            "decode_error"]
    for pdf in batches:
        out = []
        for row in pdf.itertuples(index=False):
            rec = dict.fromkeys(cols)
            rec["doc_id"] = int(row.doc_id)
            try:
                rec.update(audio_feature_row(*decode_pcm(bytes(row.payload))))
            except ValueError as e:
                rec["decode_error"] = str(e)
            out.append(rec)
        yield pd.DataFrame(out, columns=cols)


@register(
    "audio_features",
    media_sql.AUDIO_FEATURES_SQL,
    doc="Audio feature extraction via mapInPandas: windowed rms/peak/"
        "silence/clipping/zero-cross per clip, decode content-dispatched "
        "(REAL stdlib-wave parse for RIFF payloads, deterministic stub "
        "for the synthetic corpus), errors in-band. Map-only over the "
        "audio slice — the audio twin of media_extract_features. "
        "Value-level numpy twin in tests/test_audio.py.",
)
def audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tank_spark.util import ensure_workers_have_package

    ensure_workers_have_package(spark)
    return audio_slice(spark, sf_dir).mapInPandas(
        _features_kernel, AUDIO_FEATURES_SCHEMA)


# -------------------------------------------- fingerprint near-dup

FP_WINDOWS = 65  # 65 energy windows -> 64 delta-sign bits


def audio_fingerprint64(x) -> int:
    """64-bit acoustic fingerprint: mean energy over FP_WINDOWS equal
    windows (truncated-linspace boundaries, same convention as the dHash
    pooling grid), bit i = 1 where window i+1 is louder than window i,
    packed MSB-first into a SIGNED 64-bit int (Spark LongType two's
    complement). The sign-of-energy-delta shape is the public
    Haitsma-Kalker / Chromaprint family reduced to one band; small edits
    move few window energies, so near-identical clips land at small
    Hamming distance."""
    import numpy as np

    n = len(x)
    if n < FP_WINDOWS:
        raise ValueError(f"clip of {n} samples shorter than {FP_WINDOWS} windows")
    bounds = np.linspace(0, n, FP_WINDOWS + 1).astype(int)
    e = np.add.reduceat(x * x, bounds[:-1]) / np.diff(bounds)
    code = 0
    for bit in e[1:] > e[:-1]:
        code = (code << 1) | int(bit)
    if code >= 1 << 63:
        code -= 1 << 64
    return code


AUDIO_FP_SCHEMA = "doc_id long, phash long"


def _fingerprint_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload) -> (doc_id, fingerprint).
    The column is named ``phash`` because the banded Hamming join
    downstream (multimodal.phash_neardup_pairs) is hash-agnostic and
    keys on that name. Undecodable clips drop (nothing to compare).

    r10: stub-PCM rows hash through the VECTORIZED batch twin
    (media_np.fingerprint64_batch; bit-exact by the A/B pin in
    tests/test_media_np.py); genuine RIFF/WAVE payloads take the real
    stdlib parse per row, exactly as before."""
    from tank_spark.llm import media_np

    for pdf in batches:
        out = media_np.hash_frame(
            pdf,
            media_np.fingerprint64_batch,
            lambda p: audio_fingerprint64(_pcm_wav(p)[0]),
            lambda p: p[:4] == b"RIFF",
        )
        if len(out):  # yielding empties trips pandas' concat FutureWarning
            yield out


# The shared high-bit variant offset (collision-proof by construction;
# see multimodal.VARIANT_OFFSET — ADVICE r7 replaced the per-modality
# +1M/+2M/+3M constants that wrapped into each other's id spaces at
# corpus sizes >= 1M docs).
AUDIO_VARIANT_OFFSET = VARIANT_OFFSET  # backwards-compatible alias


def fingerprint_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio slice plus deterministic near-duplicate variants: every
    5th clip re-appears under doc_id+VARIANT_OFFSET with ONE
    payload byte bumped by 4 — the 're-encoded / lightly re-levelled
    copy of the same recording' case a fingerprint pass exists to catch
    (base payloads are md5 keystreams, so unrelated fingerprints sit at
    large Hamming distance; audio doc_ids are ≡1 mod 3, so %15==1 picks
    every 5th)."""
    from tank_spark.llm.multimodal import _with_variants

    m = audio_slice(spark, sf_dir)

    def tweak():
        b16 = F.conv(F.hex(F.expr("substring(payload, 16, 1)")),
                     16, 10).cast("int")
        return F.concat(
            F.expr("substring(payload, 1, 15)"),
            F.unhex(F.lpad(F.hex((b16 + 4) % 256), 2, "0")),
            F.expr("substring(payload, 17, 16)"),
        )

    return _with_variants(m, 1, tweak, "audio")


@register(
    "audio_fingerprint_neardup",
    media_sql.AUDIO_FP_NEARDUP_SQL,
    doc="Acoustic-fingerprint audio near-duplicate pairs: 64-bit "
        "energy-delta-sign fingerprint per clip (mapInPandas; decode "
        "content-dispatched), then THE SAME banded Hamming-ball join as "
        "the image family (multimodal.phash_neardup_pairs — 16-bit band "
        "buckets, pigeonhole guarantee for Hamming<=3, hot-bucket cap, "
        "exact bit_count(xor) verify): the blocking operator is "
        "hash-agnostic, so audio dedup adds zero new join machinery. "
        "Value-level twin in tests/test_audio.py pins fingerprints and "
        "the planted-pair set.",
)
def audio_fingerprint_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tank_spark.util import ensure_workers_have_package

    ensure_workers_have_package(spark)
    hashed = fingerprint_media(spark, sf_dir).mapInPandas(
        _fingerprint_kernel, AUDIO_FP_SCHEMA)
    return phash_neardup_pairs(hashed)


# ------------------------------------------------------------ resample

RESAMPLE_OUT = 512  # fixed output length (training-set normalization)
AUDIO_RESAMPLE_SCHEMA = (
    "doc_id long, in_samples int, in_rate int, out_samples int, "
    "out_rate double, resampled binary, resample_error string"
)


def block_mean_resample(x, out_n: int):
    """Deterministic block-mean downsample of a 1-D signal to ``out_n``
    samples (truncated-linspace block boundaries — the 1-D twin of
    multimodal.block_mean_resize), re-quantized to uint8 PCM bytes.
    Raises ValueError when the clip is shorter than the target
    (upsampling is a different operator)."""
    import numpy as np

    n = len(x)
    if n < out_n:
        raise ValueError(f"clip of {n} samples shorter than target {out_n}")
    bounds = np.linspace(0, n, out_n + 1).astype(int)
    g = np.add.reduceat(x, bounds[:-1]) / np.diff(bounds)
    return np.clip(np.rint((g + 1.0) * 127.5), 0, 255).astype(np.uint8)


def _resample_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload) -> fixed-length resampled
    uint8 PCM as a binary column, errors in-band."""
    cols = ["doc_id", "in_samples", "in_rate", "out_samples", "out_rate",
            "resampled", "resample_error"]
    for pdf in batches:
        out = []
        for row in pdf.itertuples(index=False):
            rec = dict.fromkeys(cols)
            rec["doc_id"] = int(row.doc_id)
            try:
                x, rate = decode_pcm(bytes(row.payload))
                rec.update({
                    "in_samples": len(x), "in_rate": int(rate),
                    "out_samples": RESAMPLE_OUT,
                    "out_rate": rate * RESAMPLE_OUT / len(x),
                    "resampled": block_mean_resample(x, RESAMPLE_OUT).tobytes(),
                })
            except ValueError as e:
                rec["resample_error"] = str(e)
            out.append(rec)
        yield pd.DataFrame(out, columns=cols)


@register(
    "audio_resample",
    media_sql.AUDIO_RESAMPLE_SQL,
    doc="Audio resample via mapInPandas: block-mean downsample of the "
        "decoded signal to a fixed training-set length, resampled bytes "
        "as a binary column, errors in-band — the audio twin of "
        "media_resize (at 100 TB the inner two lines swap for a real "
        "codec + polyphase resampler; the Spark plumbing is identical). "
        "Map-only over the audio slice. The registered parity query "
        "serializes the blob to lowercase hex (resampled_hex) — binary "
        "never survives the driver's str()-based value hash — while the "
        "kernel itself stays binary-columned.",
)
def audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tank_spark.util import ensure_workers_have_package

    ensure_workers_have_package(spark)
    out = audio_slice(spark, sf_dir).mapInPandas(
        _resample_kernel, AUDIO_RESAMPLE_SCHEMA)
    return out.select(
        "doc_id", "in_samples", "in_rate", "out_samples", "out_rate",
        F.lower(F.hex("resampled")).alias("resampled_hex"), "resample_error",
    )

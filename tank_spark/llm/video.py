"""Video columns: the video side of the multimodal pillar.

The reference treats media as opaque blobs next to typed metadata
(SURVEY.md §2.10); this module completes the image (multimodal.py) /
audio (audio.py) / VIDEO triad with the three production shapes a video
curation pipeline needs — scene-cut detection, temporal-fingerprint
near-dup, keyframe thumbnails — each as an Arrow-batched ``mapInPandas``
kernel that is map-only over the video slice (no shuffle until the dedup
join, which is the banded Hamming join shared with the image and audio
families).

Decode is CONTENT-DISPATCHED like the audio family: the real parser
reads the public YUV4MPEG2 ("Y4M") uncompressed container — plain-text
header + ``FRAME`` markers + raw planes, parseable with the stdlib
alone — so a payload that actually is a Y4M stream takes the REAL parse
wherever it appears (crafted genuine Y4M fixtures exercise that branch
in tests), while the synthetic md5-keystream payloads of the test corpus
take the clearly-marked deterministic stub (``_frames_stub``): the
payload block-tiles into N_FRAMES_STUB frames arranged in SCENE_LEN-frame
scenes, each scene viewing the payload through a different byte rotation.
The stub is LOCALITY-PRESERVING by construction (a 1-byte payload change
perturbs one block of every frame: measured, per-frame dHash moves 0-6
bits) while scene boundaries are strongly discontinuous (measured, the
rotation moves the dHash >= 18 bits) — so cut detection and near-dup
blocking both have real signal to find.

Scale posture: scene-cut / signature / keyframe extraction are canonical
mapInPandas workloads — map-only, Arrow moves the bytes once per batch;
``spark.sql.files.maxPartitionBytes`` (at 100 TB, the blob-store
chunking) sizes batches so a partition of blobs fits executor memory.
The near-dup join reuses ``multimodal.phash_neardup_pairs`` — the banded
Hamming-ball join is hash-agnostic, so video dedup adds zero new join
machinery (third consumer after image dHash and audio fingerprints).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tank_spark.llm.multimodal import (
    RESIZE_H,
    RESIZE_W,
    VARIANT_OFFSET,
    _luma_plane_stub,
    block_mean_resize,
    dhash64,
    media_df,
    phash_neardup_pairs,
)
from tank_spark.llm import media_sql
from tank_spark.plans.registry import register

N_FRAMES_STUB = 12   # stub frames per synthetic video
SCENE_LEN = 4        # stub frames per scene -> scene starts at 0, 4, 8
SCENE_ROLL = 7       # bytes each successive scene rotates the payload by
VIDEO_STUB_FPS = 4.0  # stub frame cadence (250 ms per frame)

# Consecutive-frame dHash Hamming >= this is a scene cut. Measured on the
# stub corpus: in-scene deltas (1-byte tweak worst case) top out at 6,
# scene-rotation deltas bottom out at 18 — 12 sits in the empty gap.
CUT_HAM_T = 12


def _frames_stub(payload: bytes):
    """STUB decode — deterministic fake for non-Y4M payloads (the test
    corpus's md5 keystreams). N_FRAMES_STUB frames in SCENE_LEN-frame
    scenes; scene s views the payload rotated left by SCENE_ROLL*s bytes
    and block-tiles it exactly like the image stub plane. Frames within
    a scene are identical (delta 0); scenes differ strongly (the
    rotation rearranges every block). Raises ValueError for payloads too
    short to decode, so the error path is real."""
    if len(payload) < 32:
        raise ValueError("corrupt payload")
    frames = []
    for i in range(N_FRAMES_STUB):
        k = (SCENE_ROLL * (i // SCENE_LEN)) % 32
        frames.append(_luma_plane_stub(payload[k:32] + payload[:k]))
    return frames, VIDEO_STUB_FPS


def _frames_y4m(payload: bytes):
    """REAL decode path: stdlib parse of a YUV4MPEG2 container ->
    per-frame float64 luma planes and the container's frame rate.
    ``Cmono`` and ``C420*`` colorspaces are supported (the Y plane leads
    each FRAME block); parse failures, truncated frames, and other
    colorspaces raise ValueError so they land in the in-band error
    column like any corrupt row."""
    import numpy as np

    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("decode failed: no stream header")
    try:
        toks = payload[:nl].decode("ascii").split(" ")
    except UnicodeDecodeError:
        raise ValueError("decode failed: binary stream header") from None
    if toks[0] != "YUV4MPEG2":
        raise ValueError("decode failed: not a YUV4MPEG2 stream")
    w = h = None
    fps, cs = 30.0, "420"
    for t in toks[1:]:
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("F"):
            # a corrupt rate token (F30:0, Fx:y, F30) must land in the
            # in-band error column like any decode failure — int() and
            # the unpacking already raise ValueError, but division by a
            # crafted zero denominator raises ZeroDivisionError, which
            # would escape the kernels' except-ValueError contract and
            # fail the whole task (ADVICE r7)
            num, den = t[1:].split(":")
            if int(den) == 0:
                raise ValueError("decode failed: zero frame-rate denominator")
            fps = int(num) / int(den)
        elif t.startswith("C"):
            cs = t[1:]
    if not w or not h:
        raise ValueError("decode failed: missing frame dimensions")
    if cs == "mono":
        fsz = w * h
    elif cs.startswith("420"):
        fsz = w * h + 2 * ((w // 2) * (h // 2))
    else:
        raise ValueError(f"unsupported colorspace: {cs}")
    frames, pos = [], nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("decode failed: bad FRAME marker")
        start = fnl + 1
        if start + fsz > len(payload):
            raise ValueError("decode failed: truncated frame")
        frames.append(
            np.frombuffer(payload[start:start + w * h], dtype=np.uint8)
            .astype(np.float64).reshape(h, w))
        pos = start + fsz
    if not frames:
        raise ValueError("empty video stream")
    return frames, fps


def decode_frames(payload: bytes):
    """payload -> (list of 2-D float64 luma planes, fps). Content
    dispatch: genuine YUV4MPEG2 bytes take the real stdlib parse;
    anything else takes the deterministic stub."""
    if payload[:9] == b"YUV4MPEG2":
        return _frames_y4m(payload)
    return _frames_stub(payload)


def video_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video rows of the derived media table (doc_id % 3 == 2)."""
    return (
        media_df(spark, sf_dir)
        .filter(F.col("meta.media_type") == "video/mp4")
        .select("doc_id", "payload")
    )


def frame_hashes(payload: bytes) -> tuple[list[int], float]:
    """Decode + per-frame dHash — the shared front half of every kernel
    here, so cut detection, signatures, and keyframes agree on what a
    frame looks like."""
    frames, fps = decode_frames(payload)
    return [dhash64(f) for f in frames], fps


def scene_cut_indices(hashes: list[int]) -> list[tuple[int, int]]:
    """(frame_idx, hamming) for every frame whose dHash sits >= CUT_HAM_T
    bits from its predecessor — the classic hash-delta shot-boundary
    rule (public technique: frame-difference shot detection applied to
    perceptual hashes)."""
    cuts = []
    for i in range(1, len(hashes)):
        d = bin((hashes[i] ^ hashes[i - 1]) & (2**64 - 1)).count("1")
        if d >= CUT_HAM_T:
            cuts.append((i, d))
    return cuts


def video_signature64(hashes: list[int]) -> int:
    """64-bit temporal signature: strict-majority vote per bit across
    the per-frame dHashes, packed MSB-first into a SIGNED 64-bit int
    (Spark LongType two's complement — same convention as dhash64 /
    audio_fingerprint64). Majority voting keeps the signature stable
    under small per-frame perturbations (measured: the planted 1-byte
    re-encode moves it <= 3 bits for ~94% of clips) while unrelated
    videos land ~30 bits apart."""
    n = len(hashes)
    if n == 0:
        raise ValueError("no frames")
    us = [h & (2**64 - 1) for h in hashes]
    code = 0
    for bit in range(63, -1, -1):
        cnt = sum((u >> bit) & 1 for u in us)
        code = (code << 1) | (1 if 2 * cnt > n else 0)
    return code - (1 << 64) if code >= 1 << 63 else code


# ------------------------------------------------------------ scene cuts

SCENE_CUTS_SCHEMA = (
    "doc_id long, cut_idx int, frame_idx int, ts_ms long, hamming int"
)


def _scene_cut_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas fan-out kernel: each video row yields one row per
    detected scene cut. Undecodable videos drop (the decode-error audit
    lives in media_extract_features, same policy as the hash kernels)."""
    cols = ["doc_id", "cut_idx", "frame_idx", "ts_ms", "hamming"]
    for pdf in batches:
        out = []
        for row in pdf.itertuples(index=False):
            try:
                hs, fps = frame_hashes(bytes(row.payload))
            except ValueError:
                continue
            for ci, (fi, d) in enumerate(scene_cut_indices(hs)):
                out.append({"doc_id": int(row.doc_id), "cut_idx": ci,
                            "frame_idx": fi,
                            "ts_ms": int(round(fi * 1000.0 / fps)),
                            "hamming": d})
        yield pd.DataFrame(out, columns=cols)


@register(
    "video_scene_cuts",
    media_sql.VIDEO_SCENE_CUTS_SQL,
    doc="Scene-cut detection via mapInPandas fan-out: per-frame dHash, "
        "consecutive-frame Hamming delta, a cut row wherever the delta "
        "crosses the measured threshold (in-scene deltas <= 6, scene "
        "rotations >= 18 on the stub corpus — 12 splits the gap). Decode "
        "content-dispatched: genuine YUV4MPEG2 payloads take the REAL "
        "stdlib parse, synthetic payloads the deterministic scene-"
        "structured stub. Map-only over the video slice; value-level "
        "pure-Python twin in tests/test_video.py.",
)
def video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tank_spark.util import ensure_workers_have_package

    ensure_workers_have_package(spark)
    return video_slice(spark, sf_dir).mapInPandas(
        _scene_cut_kernel, SCENE_CUTS_SCHEMA)


# -------------------------------------------------- temporal fingerprint

VIDEO_FP_SCHEMA = "doc_id long, phash long"


def _signature_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload) -> (doc_id, signature). The
    column is named ``phash`` because the banded Hamming join downstream
    (multimodal.phash_neardup_pairs) is hash-agnostic and keys on that
    name. Undecodable videos drop (nothing to compare).

    r10: stub-frame rows hash through the VECTORIZED batch twin
    (media_np.signature64_batch — the 3 rotated scene dHashes and the
    2-of-3 bitwise majority in a handful of numpy calls; bit-exact by
    the A/B pin in tests/test_media_np.py); genuine YUV4MPEG2 payloads
    take the real stdlib parse per row, exactly as before."""
    from tank_spark.llm import media_np

    def _scalar(p: bytes) -> int:
        hs, _ = frame_hashes(p)
        return video_signature64(hs)

    for pdf in batches:
        out = media_np.hash_frame(
            pdf,
            media_np.signature64_batch,
            _scalar,
            lambda p: p[:9] == b"YUV4MPEG2",
        )
        if len(out):  # yielding empties trips pandas' concat FutureWarning
            yield out


# The shared high-bit variant offset (collision-proof by construction;
# see multimodal.VARIANT_OFFSET — ADVICE r7 replaced the per-modality
# +1M/+2M/+3M constants that wrapped into each other's id spaces at
# corpus sizes >= 1M docs).
VIDEO_VARIANT_OFFSET = VARIANT_OFFSET  # backwards-compatible alias


def signature_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video slice plus deterministic near-duplicate variants: every
    5th video re-appears under doc_id+VARIANT_OFFSET with ONE
    payload byte bumped by 8 — the 're-encoded / lightly edited copy of
    the same footage' case a temporal fingerprint exists to catch (base
    payloads are md5 keystreams, so unrelated signatures sit ~30 bits
    apart; video doc_ids are ≡2 mod 3, so %15==2 picks every 5th)."""
    from tank_spark.llm.multimodal import _with_variants

    m = video_slice(spark, sf_dir)

    def tweak():
        b12 = F.conv(F.hex(F.expr("substring(payload, 12, 1)")),
                     16, 10).cast("int")
        return F.concat(
            F.expr("substring(payload, 1, 11)"),
            F.unhex(F.lpad(F.hex((b12 + 8) % 256), 2, "0")),
            F.expr("substring(payload, 13, 20)"),
        )

    return _with_variants(m, 2, tweak, "video")


@register(
    "video_phash_neardup",
    media_sql.VIDEO_PHASH_NEARDUP_SQL,
    doc="Temporal-fingerprint video near-duplicate pairs: per-frame "
        "dHash -> strict-majority 64-bit signature per video "
        "(mapInPandas; decode content-dispatched), then THE SAME banded "
        "Hamming-ball join as the image and audio families "
        "(multimodal.phash_neardup_pairs — 16-bit band buckets, "
        "pigeonhole guarantee for Hamming<=3, hot-bucket cap, exact "
        "bit_count(xor) verify): the blocking operator is hash-agnostic, "
        "so video dedup adds zero new join machinery. Value-level twin "
        "in tests/test_video.py pins signatures and the planted-pair "
        "set.",
)
def video_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tank_spark.util import ensure_workers_have_package

    ensure_workers_have_package(spark)
    hashed = signature_media(spark, sf_dir).mapInPandas(
        _signature_kernel, VIDEO_FP_SCHEMA)
    return phash_neardup_pairs(hashed)


# ------------------------------------------------------------- keyframes

KEYFRAME_SCHEMA = (
    "doc_id long, scene_idx int, frame_idx int, ts_ms long, thumb binary"
)


def _keyframe_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas fan-out kernel: each video row yields one thumbnail
    row per scene — frame 0 plus the first frame after every detected
    cut, block-mean downsampled to the training thumbnail grid (the
    image family's resize kernel applied at scene granularity). The
    composition IS the point: cut detection and keyframe choice share
    frame_hashes, so a keyframe is always the first frame of a detected
    scene."""
    cols = ["doc_id", "scene_idx", "frame_idx", "ts_ms", "thumb"]
    for pdf in batches:
        out = []
        for row in pdf.itertuples(index=False):
            payload = bytes(row.payload)
            try:
                frames, fps = decode_frames(payload)
                hs = [dhash64(f) for f in frames]
            except ValueError:
                continue
            starts = [0] + [fi for fi, _ in scene_cut_indices(hs)]
            for si, fi in enumerate(starts):
                try:
                    thumb = block_mean_resize(frames[fi], RESIZE_H, RESIZE_W)
                except ValueError:
                    continue  # frame smaller than the thumbnail grid
                out.append({"doc_id": int(row.doc_id), "scene_idx": si,
                            "frame_idx": fi,
                            "ts_ms": int(round(fi * 1000.0 / fps)),
                            "thumb": thumb.tobytes()})
        yield pd.DataFrame(out, columns=cols)


@register(
    "video_keyframes",
    media_sql.VIDEO_KEYFRAMES_SQL,
    doc="Keyframe thumbnail extraction via mapInPandas fan-out: one "
        "block-mean thumbnail per detected scene (frame 0 + the first "
        "frame after every cut), thumbnail bytes as a binary column — "
        "the canonical 'represent each shot by one image' stage of a "
        "video-training pipeline. Shares frame_hashes with "
        "video_scene_cuts so keyframes and cuts can never disagree. "
        "Map-only over the video slice. The registered parity query "
        "serializes the thumbnail blob to lowercase hex (thumb_hex) — "
        "binary never survives the driver's str()-based value hash.",
)
def video_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tank_spark.util import ensure_workers_have_package

    ensure_workers_have_package(spark)
    out = video_slice(spark, sf_dir).mapInPandas(
        _keyframe_kernel, KEYFRAME_SCHEMA)
    return out.select(
        "doc_id", "scene_idx", "frame_idx", "ts_ms",
        F.lower(F.hex("thumb")).alias("thumb_hex"),
    )

"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched ``mapInPandas`` kernels.

The decode step is IMPORT-GUARDED (``get_image_decoder``): when Pillow is
importable on the executor the real PIL decode runs; otherwise the
clearly-marked deterministic fake ``_decode_image_stub`` stands in (this
container ships no imaging libraries, so the stub branch is what local
tests exercise — plus the real branch via an injected fake PIL).
Everything AROUND the decoder is the real production plumbing this module
exists to exercise: binary column schema, metadata struct, batch-iterator
UDF signature, per-batch vectorization, partition sizing.

The driver ships no binary table, so ``media_df`` derives one: each
document gets a synthetic payload whose bytes are the md5 keystream of its
text — deterministic, engine-reproducible (the metadata queries are
oracle-checked; the pixel-level kernel is rows-only).

Scale posture: media processing is the canonical mapInPandas workload —
map-only over the table, no shuffle; ``spark.sql.files.maxPartitionBytes``
(and at 100 TB, the blob-store chunking) sizes batches so a partition of
blobs fits executor memory; Arrow moves the bytes once per batch, not per
row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tank_spark.plans.registry import register
from tank_spark.sources.tables import load

FAKE_W, FAKE_H = 32, 24  # synthetic "image" dimensions


def media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + a derived binary payload column and metadata struct.

    payload = unhex(md5(text) || md5(text || ':1')) — 32 deterministic
    bytes standing in for an encoded image; media_type cycles by doc_id.
    """
    d = load(spark, sf_dir, "documents")
    payload = F.unhex(
        F.concat(F.md5("text"), F.md5(F.concat(F.col("text"), F.lit(":1"))))
    )
    mt = F.element_at(
        F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            mt.alias("media_type"),
            F.length(payload).alias("n_bytes"),
            F.lit(FAKE_W).alias("width"),
            F.lit(FAKE_H).alias("height"),
        ).alias("meta"),
    )


@register(
    "media_metadata",
    """
    SELECT doc_id,
           CASE (doc_id % 3) WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
                             ELSE 'video/mp4' END AS media_type,
           32 AS n_bytes,
           md5(text) AS payload_head_md5
    FROM documents
    """,
    doc="Multimodal metadata projection (binary column stays opaque; "
        "metadata is queryable like any column). Oracle-checked via the "
        "deterministic payload derivation.",
)
def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_df(spark, sf_dir)
    return m.select(
        "doc_id",
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.lower(F.hex(F.substring("payload", 1, 16))).alias("payload_head_md5"),
    )


def _decode_image_stub(payload: bytes) -> dict:
    """STUB — deterministic fake for the image decode step (the fallback
    when Pillow is not importable; see ``get_image_decoder``). Decode is
    simulated by treating the payload bytes as a tiny luma plane. Raises
    ValueError for payloads that are "corrupt" (too short), so the error
    path is real.
    """
    if len(payload) < 8:
        raise ValueError("corrupt payload")
    total = sum(payload)
    return {
        "mean_luma": total / len(payload) / 255.0,
        "max_byte": max(payload),
        "decoded_w": FAKE_W,
        "decoded_h": FAKE_H,
    }


def _decode_image_pil(payload: bytes) -> dict:
    """Real decode path: PIL open -> greyscale numpy plane -> the same
    feature dict the stub emits. Only reachable when Pillow imports
    (``get_image_decoder``); bytes that are not a decodable image raise
    ValueError so they land in ``decode_error`` like any corrupt row."""
    import io

    import numpy as np
    from PIL import Image

    if len(payload) < 8:
        raise ValueError("corrupt payload")
    try:
        img = Image.open(io.BytesIO(payload))
        arr = np.asarray(img.convert("L"), dtype=np.float64)
    except Exception as exc:  # PIL raises a zoo of types for bad bytes
        raise ValueError(f"decode failed: {exc}") from None
    return {
        "mean_luma": float(arr.mean()) / 255.0,
        "max_byte": int(arr.max()),
        "decoded_w": int(img.width),
        "decoded_h": int(img.height),
    }


def get_image_decoder():
    """The decode step, import-guarded: the REAL Pillow decoder wherever
    the dependency exists, the deterministic stub otherwise. Resolved at
    kernel start ON THE EXECUTOR (each worker process probes its own
    environment), so a cluster with Pillow installed gets real features
    with zero code changes."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        return _decode_image_stub
    return _decode_image_pil


MEDIA_FEATURES_SCHEMA = (
    "doc_id long, media_type string, mean_luma double, max_byte int, "
    "decoded_w int, decoded_h int, decode_error string"
)


def _extract_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: per Arrow batch, decode payloads and emit
    feature rows; decode failures become rows with ``decode_error`` set
    (dead-letter-in-band, like ingest coercion). The decoder resolves
    once per kernel invocation — real PIL when importable, stub when not."""
    decode = get_image_decoder()
    for pdf in batches:
        out = []
        for row in pdf.itertuples(index=False):
            rec = {"doc_id": int(row.doc_id),
                   "media_type": row.meta["media_type"],
                   "mean_luma": None, "max_byte": None,
                   "decoded_w": None, "decoded_h": None, "decode_error": None}
            try:
                rec.update(decode(bytes(row.payload)))
            except ValueError as e:
                rec["decode_error"] = str(e)
            out.append(rec)
        yield pd.DataFrame(out)


@register(
    "media_extract_features",
    None,  # the decode kernel is Python-side -> rows-only check
    doc="Multimodal feature extraction via mapInPandas (decode step "
        "STUBBED deterministically; Spark-side plumbing — schema, Arrow "
        "batching, error-in-band — is real).",
)
def media_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tank_spark.util import ensure_workers_have_package

    ensure_workers_have_package(spark)
    return media_df(spark, sf_dir).mapInPandas(_extract_kernel, MEDIA_FEATURES_SCHEMA)


N_FRAMES = 3
FRAME_SCHEMA = "doc_id long, frame_idx int, ts_ms long, frame_md5 string"


def _frame_sample_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas fan-out kernel: each video row yields N_FRAMES frame
    rows (1 -> N). Frame extraction is STUBBED deterministically (ffmpeg
    absent): frame bytes are modeled as md5(payload || frame_idx); the
    real system swaps only the inner expression. The fan-out shape —
    batch in, multiple rows per input out — is the real plumbing."""
    import hashlib

    for pdf in batches:
        out = []
        for row in pdf.itertuples(index=False):
            if row.meta["media_type"] != "video/mp4":
                continue
            payload = bytes(row.payload)
            for i in range(N_FRAMES):
                out.append({
                    "doc_id": int(row.doc_id),
                    "frame_idx": i,
                    "ts_ms": i * 1000,
                    "frame_md5": hashlib.md5(payload + bytes([i])).hexdigest(),
                })
        yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "ts_ms", "frame_md5"])


@register(
    "media_frame_sample",
    None,  # python kernel -> rows-only
    doc="Video frame sampling via mapInPandas fan-out (decode stubbed): "
        "each video row emits N deterministic frame rows — the shape of "
        "frame extraction / chunking pipelines at scale (map-only, output "
        "cardinality N x inputs, no shuffle).",
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tank_spark.util import ensure_workers_have_package

    ensure_workers_have_package(spark)
    return media_df(spark, sf_dir).mapInPandas(_frame_sample_kernel, FRAME_SCHEMA)

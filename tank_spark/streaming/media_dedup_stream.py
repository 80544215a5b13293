"""Streaming incremental MEDIA dedup: the production shape of
media_dedup_incremental (llm/media_inc.py) — a media crawl feed arrives
as micro-batches of (cid, modality, payload) rows, each is dispositioned
against a PERSISTED perceptual-hash index (the media_index_build
artifact), and every batch's new_unique survivors are appended to the
index before the next batch probes it.

This is the media twin of streaming/dedup_stream.py, sharing its loop
shape verbatim; the probe logic is shared with the batch op via
media_inc.media_disposition_against_index, and the batch twin
media_dedup_stream_replay (full DuckDB oracle) pins the index-growth
disposition semantics this module must reproduce.

Index layout under ``index_dir``:

- ``fp/``    — parquet (icid BIGINT, modality STRING, fp STRING):
  lowercase payload hex, the exact-dup probe side.
- ``bands/`` — parquet (icid BIGINT, modality STRING, phash BIGINT,
  band_idx INT, band_val BIGINT): the 4x16-bit phash band
  decomposition, the near-dup probe side (phash rides along for the
  exact Hamming verify).

At 100 TB the index is the big side and never shuffles: each probe
scans it once with the (small) micro-batch BROADCAST into every join.
In production ``bands/`` would be written bucketed by
(modality, band_val) so probe joins co-locate; appends stay
per-batch-bounded either way. The foreachBatch sink is
idempotent-at-least-once like the other sinks here (epoch guard column
on the output; replayed appends are droppable by readers).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tank_spark.llm.media_inc import (
    _bands,
    _hashed_media,
    media_disposition_against_index,
)

_FP_SCHEMA = "icid long, modality string, fp string"
_BANDS_SCHEMA = ("icid long, modality string, phash long, "
                 "band_idx int, band_val long")


def media_fp_and_bands(
    spark: SparkSession, media: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """(fp, bands) relations for a (cid, modality, payload) relation —
    the two index structures, derived exactly as media_index_build
    does (each payload through its modality's map-only hash kernel)."""
    fps = media.select(
        "cid", "modality", F.lower(F.hex("payload")).alias("fp"))
    bands = _bands(_hashed_media(spark, media))
    return fps, bands


def write_media_index(spark: SparkSession, media: DataFrame,
                      index_dir: str) -> None:
    """Materialize the initial corpus index (overwrite): the batch-mode
    bootstrap before the stream starts appending to it."""
    fps, bands = media_fp_and_bands(spark, media)
    fps.select(F.col("cid").alias("icid"), "modality", "fp") \
        .write.mode("overwrite").parquet(os.path.join(index_dir, "fp"))
    bands.select(F.col("cid").alias("icid"), "modality", "phash",
                 "band_idx", "band_val") \
        .write.mode("overwrite").parquet(os.path.join(index_dir, "bands"))


def read_media_index(spark: SparkSession,
                     index_dir: str) -> tuple[DataFrame, DataFrame]:
    """The current index relations (explicit schemas, as dedup_stream)."""
    ifp = spark.read.schema(_FP_SCHEMA).parquet(os.path.join(index_dir, "fp"))
    ib = spark.read.schema(_BANDS_SCHEMA).parquet(
        os.path.join(index_dir, "bands"))
    return ifp, ib


def disposition_media_batch(spark: SparkSession, batch: DataFrame,
                            ifp: DataFrame, ib: DataFrame) -> DataFrame:
    """Disposition one (cid, modality, payload) micro-batch against
    index relations: (doc_id, modality, disposition, match_cid,
    n_bands_hit) — the shared probe."""
    bfp, bb = media_fp_and_bands(spark, batch)
    return media_disposition_against_index(
        bfp.select(F.col("cid").alias("bcid"), "modality", "fp"),
        ifp,
        bb.select(F.col("cid").alias("bcid"), "modality",
                  F.col("phash").alias("bphash"), "band_idx", "band_val"),
        ib,
    )


def start_incremental_media_dedup_stream(
    spark: SparkSession,
    media_stream: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Wire the loop: for each micro-batch of (cid, modality, payload)
    media rows,

    1. disposition against the CURRENT index (read fresh per epoch —
       it grew by earlier epochs' appends),
    2. append the dispositions (+ epoch id) to ``out_dir``,
    3. append the new_unique survivors' fingerprints and phash bands
       to the index, so later epochs — and tomorrow's run — dedup
       against them.

    Returns the started StreamingQuery. ``checkpoint_dir`` must live
    OUTSIDE any watched drop dir (standing gotcha).
    """

    def _sink(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        # survivors append twice (fp + bands) and disposition writes
        # once — pin the batch so the source is read one time
        batch = batch.localCheckpoint(eager=True)
        ifp, ib = read_media_index(spark, index_dir)
        disp = disposition_media_batch(spark, batch, ifp, ib) \
            .localCheckpoint(eager=True)
        disp.withColumn("epoch_id", F.lit(epoch_id).cast("long")) \
            .write.mode("append").parquet(out_dir)
        new_ids = disp.filter(F.col("disposition") == "new_unique") \
            .select(F.col("doc_id").alias("cid"))
        survivors = batch.join(F.broadcast(new_ids), "cid")
        fps, bands = media_fp_and_bands(spark, survivors)
        fps.select(F.col("cid").alias("icid"), "modality", "fp") \
            .write.mode("append").parquet(os.path.join(index_dir, "fp"))
        bands.select(F.col("cid").alias("icid"), "modality", "phash",
                     "band_idx", "band_val") \
            .write.mode("append").parquet(os.path.join(index_dir, "bands"))

    writer = (
        media_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def media_file_stream(spark: SparkSession, drop_dir: str,
                      max_files_per_trigger: int = 1) -> DataFrame:
    """A (cid, modality, payload) file stream over a parquet drop dir —
    one file per micro-batch by default, so each dropped file IS a
    crawl increment."""
    schema = T.StructType([
        T.StructField("cid", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ])
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(drop_dir)
    )

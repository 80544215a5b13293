"""Streaming incremental dedup: the production shape of
dedup_incremental_batch (llm/dedup.py) — a crawl feed arrives as
micro-batches, each is dispositioned against a PERSISTED corpus index
(the dedup_index_build artifact), and every batch's new_unique
survivors are appended to the index before the next batch probes it.

Reference parity: the reference engine has no streaming surface at all
(SURVEY.md §2.11 — extension category); the semantics here are the
snapshot-crawl dedup loop every training-data pipeline runs daily, and
the batch twin (dedup_incremental_stream_replay, full DuckDB oracle)
pins the disposition semantics this module must reproduce.

Index layout under ``index_dir``:

- ``fp/``    — parquet (icid BIGINT, fp STRING): normalized-text md5
  fingerprints, the exact-dup probe side.
- ``bands/`` — parquet (icid BIGINT, band_idx INT, band_val STRING):
  LSH band digests, the near-dup probe side.

At 100 TB the index is the big side and never shuffles: each probe
scans it once with the (small) micro-batch BROADCAST into both joins —
disposition_against_index is shared verbatim with the batch op. In
production ``bands/`` would be written bucketed by band_val so probe
joins co-locate; appends stay per-batch-bounded either way. The
foreachBatch sink is idempotent-at-least-once like the other sinks
here: Spark replays a failed epoch, and the epoch guard column lets a
replayed append be dropped by readers (exactly-once compaction is the
table_ops story, not re-solved here).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tank_spark.llm.dedup import (
    K,
    _bands_df,
    _shingles_df,
    _sigs_df,
    disposition_against_index,
)

_FP_SCHEMA = "icid long, fp string"
_BANDS_SCHEMA = "icid long, band_idx int, band_val string"

_norm_fp = F.md5(F.lower(F.regexp_replace("text", r"\s+", " ")))


def fingerprints_and_bands(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(fp, bands) relations for a (cid, text) relation — the two index
    structures, derived exactly as dedup_index_build does."""
    fps = docs.select("cid", _norm_fp.alias("fp"))
    bands = _bands_df(_sigs_df(_shingles_df(docs), K, 1))
    return fps, bands


def write_dedup_index(docs: DataFrame, index_dir: str) -> None:
    """Materialize the initial corpus index (overwrite): the batch-mode
    bootstrap before the stream starts appending to it."""
    fps, bands = fingerprints_and_bands(docs)
    fps.select(F.col("cid").alias("icid"), "fp") \
        .write.mode("overwrite").parquet(os.path.join(index_dir, "fp"))
    bands.select(F.col("cid").alias("icid"), "band_idx", "band_val") \
        .write.mode("overwrite").parquet(os.path.join(index_dir, "bands"))


def read_dedup_index(spark: SparkSession,
                     index_dir: str) -> tuple[DataFrame, DataFrame]:
    """The current index relations. Explicit schemas so an (allowed)
    empty bands/ dir after a fingerprint-only bootstrap still reads."""
    ifp = spark.read.schema(_FP_SCHEMA).parquet(os.path.join(index_dir, "fp"))
    ib = spark.read.schema(_BANDS_SCHEMA).parquet(
        os.path.join(index_dir, "bands"))
    return ifp, ib


def disposition_batch(batch: DataFrame, ifp: DataFrame,
                      ib: DataFrame) -> DataFrame:
    """Disposition one (cid, text) micro-batch against index relations:
    (doc_id, disposition, match_cid, n_bands_hit) — the shared probe."""
    bfp, bb = fingerprints_and_bands(batch)
    return disposition_against_index(
        bfp.select(F.col("cid").alias("bcid"), "fp"),
        ifp,
        bb.select(F.col("cid").alias("bcid"), "band_idx", "band_val"),
        ib,
    )


def start_incremental_dedup_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Wire the loop: for each micro-batch of (cid, text) docs,

    1. disposition against the CURRENT index (read fresh per epoch —
       it grew by earlier epochs' appends),
    2. append the dispositions (+ epoch id) to ``out_dir``,
    3. append the new_unique survivors' fingerprints and band digests
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
        ifp, ib = read_dedup_index(spark, index_dir)
        disp = disposition_batch(batch, ifp, ib).localCheckpoint(eager=True)
        disp.withColumn("epoch_id", F.lit(epoch_id).cast("long")) \
            .write.mode("append").parquet(out_dir)
        new_ids = disp.filter(F.col("disposition") == "new_unique") \
            .select(F.col("doc_id").alias("cid"))
        survivors = batch.join(F.broadcast(new_ids), "cid")
        fps, bands = fingerprints_and_bands(survivors)
        fps.select(F.col("cid").alias("icid"), "fp") \
            .write.mode("append").parquet(os.path.join(index_dir, "fp"))
        bands.select(F.col("cid").alias("icid"), "band_idx", "band_val") \
            .write.mode("append").parquet(os.path.join(index_dir, "bands"))

    writer = (
        docs_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def docs_file_stream(spark: SparkSession, drop_dir: str,
                     max_files_per_trigger: int = 1) -> DataFrame:
    """A (cid, text) file stream over a parquet drop dir — one file per
    micro-batch by default, so each dropped file IS a crawl increment."""
    schema = T.StructType([
        T.StructField("cid", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(drop_dir)
    )

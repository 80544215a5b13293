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

Index layout under ``index_dir`` (hive-partitioned by write epoch,
the r11 layout shared with media_dedup_stream):

- ``fp/epoch_id=<E>/``    — parquet (icid BIGINT, fp STRING):
  normalized-text md5 fingerprints, the exact-dup probe side.
- ``bands/epoch_id=<E>/`` — parquet (icid BIGINT, band_idx INT,
  band_val STRING): LSH band digests, the near-dup probe side.

``epoch_id=-1`` is the base generation (bootstrap and compaction
rewrites); each micro-batch writes its survivors under its own
``epoch_id=<E>`` directory with mode("overwrite"), so a REPLAYED epoch
rewrites instead of duplicating — duplicated index rows were harmless
for MIN(icid) matching but inflated per-bucket counts toward
LSH_BUCKET_CAP, silently disabling near-dup matching in those buckets
(the media twin's ADVICE r10 finding applies identically here). The
disposition OUTPUT keeps the weaker posture: append + epoch guard
column, replayed epochs droppable by readers. ``compact_dedup_index``
folds epoch dirs back into the base generation with ``bands/``
repartitioned by band_val (probe co-location) — the stream loop runs
it every ``compact_every`` epochs.

At 100 TB the index is the big side and never shuffles: each probe
scans it once with the (small) micro-batch BROADCAST into both joins —
disposition_against_index is shared verbatim with the batch op.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tank_spark.llm.dedup import (
    K,
    _bands_df,
    _shingles_df,
    _sigs_map_only,
    disposition_against_index,
)
from tank_spark.streaming._swap import recover_interrupted_swap

_FP_SCHEMA = "icid long, fp string, epoch_id long"
_BANDS_SCHEMA = "icid long, band_idx int, band_val string, epoch_id long"

BASE_EPOCH = -1  # the bootstrap/compacted generation's directory


def _epoch_dir(index_dir: str, rel: str, epoch_id: int) -> str:
    return os.path.join(index_dir, rel, f"epoch_id={epoch_id}")


def _ensure_epoch_layout(index_dir: str, rel: str) -> None:
    """Migrate a pre-r11 FLAT relation (part files directly under the
    root) into the base-generation directory. Without this, a stream
    resumed over an old index would write epoch_id= dirs NEXT TO flat
    files and Spark's partition discovery would fail the next read with
    'Conflicting directory structures' (review r11). Also the hook
    where a compaction swap interrupted between its two renames is
    auto-restored from the surviving ``.old`` generation (ADVICE
    r11)."""
    root = os.path.join(index_dir, rel)
    recover_interrupted_swap(root)
    if not os.path.isdir(root):
        return
    flat = [f for f in os.listdir(root)
            if not f.startswith("epoch_id=") and not f.startswith(".")]
    if not any(f.endswith(".parquet") for f in flat):
        return
    base = _epoch_dir(index_dir, rel, BASE_EPOCH)
    os.makedirs(base, exist_ok=True)
    for f in flat:
        os.rename(os.path.join(root, f), os.path.join(base, f))

_norm_fp = F.md5(F.lower(F.regexp_replace("text", r"\s+", " ")))


def fingerprints_and_bands(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(fp, bands) relations for a (cid, text) relation — the two index
    structures, derived exactly as dedup_index_build does."""
    fps = docs.select("cid", _norm_fp.alias("fp"))
    bands = _bands_df(_sigs_map_only(docs, K, 1))
    return fps, bands


def _write_index_epoch(docs: DataFrame, index_dir: str,
                       epoch_id: int) -> None:
    """One epoch's index rows, written idempotently: overwrite of the
    epoch's own directory, so a foreachBatch replay rewrites instead of
    duplicating."""
    _ensure_epoch_layout(index_dir, "fp")
    _ensure_epoch_layout(index_dir, "bands")
    fps, bands = fingerprints_and_bands(docs)
    fps.select(F.col("cid").alias("icid"), "fp") \
        .write.mode("overwrite").parquet(_epoch_dir(index_dir, "fp", epoch_id))
    bands.select(F.col("cid").alias("icid"), "band_idx", "band_val") \
        .write.mode("overwrite") \
        .parquet(_epoch_dir(index_dir, "bands", epoch_id))


def write_dedup_index(docs: DataFrame, index_dir: str) -> None:
    """Materialize the initial corpus index (the base generation): the
    batch-mode bootstrap before the stream starts appending to it."""
    _write_index_epoch(docs, index_dir, BASE_EPOCH)


def read_dedup_index(spark: SparkSession,
                     index_dir: str) -> tuple[DataFrame, DataFrame]:
    """The current index relations across every generation/epoch.
    Explicit schemas so an (allowed) empty bands/ dir after a
    fingerprint-only bootstrap still reads; epoch_id (the hive
    partition column) is dropped — the probe is epoch-agnostic,
    idempotency lives in the directory layout."""
    _ensure_epoch_layout(index_dir, "fp")
    _ensure_epoch_layout(index_dir, "bands")
    ifp = (spark.read.schema(_FP_SCHEMA)
           .parquet(os.path.join(index_dir, "fp")).drop("epoch_id"))
    ib = (spark.read.schema(_BANDS_SCHEMA)
          .parquet(os.path.join(index_dir, "bands")).drop("epoch_id"))
    return ifp, ib


def compact_dedup_index(spark: SparkSession, index_dir: str,
                        n_buckets: int = 32) -> None:
    """Fold every per-epoch append back into the base generation:
    ``bands/`` rewritten partitioned by band_val (the probe join key)
    and sorted within partitions, ``fp/`` by fp. Bounds the small-files
    growth of per-epoch appends and restores probe co-location; same
    tmp-write + rename swap (and the same production caveat: a table
    format makes this one transaction) as the media twin."""
    ifp, ib = read_dedup_index(spark, index_dir)
    tmp_fp = os.path.join(index_dir, "fp.compact")
    tmp_bands = os.path.join(index_dir, "bands.compact")
    shutil.rmtree(tmp_fp, ignore_errors=True)
    shutil.rmtree(tmp_bands, ignore_errors=True)
    (ifp.repartition(n_buckets, "fp").sortWithinPartitions("fp")
        .write.parquet(os.path.join(tmp_fp, f"epoch_id={BASE_EPOCH}")))
    (ib.repartition(n_buckets, "band_val")
       .sortWithinPartitions("band_idx", "band_val")
       .write.parquet(os.path.join(tmp_bands, f"epoch_id={BASE_EPOCH}")))
    for rel, tmp in (("fp", tmp_fp), ("bands", tmp_bands)):
        live = os.path.join(index_dir, rel)
        old = live + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(live, old)
        os.rename(tmp, live)
        shutil.rmtree(old)


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
    compact_every: int = 0,
):
    """Wire the loop: for each micro-batch of (cid, text) docs,

    1. disposition against the CURRENT index (read fresh per epoch —
       it grew by earlier epochs' appends),
    2. append the dispositions (+ epoch id) to ``out_dir``,
    3. write the new_unique survivors' fingerprints and band digests to
       the index under the epoch's own directory (overwrite — replay
       idempotent),
    4. every ``compact_every`` epochs (0 = never), fold the per-epoch
       dirs back into one co-partitioned base generation.

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
        # skip the index write when there are no survivors (cheap: disp
        # is checkpointed) — load-bearing for crash safety: a replay
        # after a partially-swapped compaction re-dispositions as
        # all-dup, and an unconditional overwrite would replace the
        # epoch's only surviving rows with an empty dir (review r11)
        if not new_ids.isEmpty():
            survivors = batch.join(F.broadcast(new_ids), "cid")
            _write_index_epoch(survivors, index_dir, epoch_id)
        if compact_every and (epoch_id + 1) % compact_every == 0:
            compact_dedup_index(spark, index_dir)

    writer = (
        docs_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream_report(spark: SparkSession, out_dir: str,
                        docs: DataFrame,
                        provenance: Column | None = None) -> DataFrame:
    """The daily curation report OFF THE PERSISTED disposition output —
    the production form of the registered dedup_incremental_stream_report
    (which re-derives the replay in one plan for the oracle gate): read
    ``out_dir``, map doc_id to provenance ``orig`` (default: the corpus
    convention ``doc_id % INC_BATCH_OFFSET``; a deployment passes its
    own id scheme), join the caller's ``docs`` (orig, source) relation,
    and aggregate per (epoch_id, source, disposition) through the SAME
    curation_report_over core as every registered report. Marginal
    daily cost at crawl cadence: one broadcast aggregate over that
    day's partition — no replay re-derivation."""
    from tank_spark.llm.dedup import INC_BATCH_OFFSET
    from tank_spark.llm.media_inc import (
        MEDIA_DISPOSITION_PRECEDENCE,
        collapse_replayed_epochs,
        curation_report_over,
    )

    # the 'readers drop replayed epochs' half of the output posture
    # (review r11: documented but previously unimplemented; the text
    # family shares the media disposition vocabulary)
    disp = collapse_replayed_epochs(
        spark.read.parquet(out_dir), "doc_id",
        MEDIA_DISPOSITION_PRECEDENCE)
    orig = provenance if provenance is not None else (
        F.col("doc_id") % INC_BATCH_OFFSET)
    disp = disp.select(orig.alias("orig"), "epoch_id",
                       "disposition", "match_cid")
    return curation_report_over(docs, disp, ["epoch_id", "source"])


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

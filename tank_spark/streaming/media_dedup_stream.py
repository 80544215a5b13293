"""Streaming incremental MEDIA dedup: the production shape of
media_dedup_incremental (llm/media_inc.py) — a media crawl feed arrives
as micro-batches of (cid, modality, payload) rows, each is dispositioned
against a PERSISTED perceptual-hash index (the media_index_build
artifact shape: fp + phash + bands), and every batch's new_unique
survivors are appended to the index before the next batch probes it.

This is the media twin of streaming/dedup_stream.py, sharing its loop
shape verbatim; the probe logic is shared with the batch op via
media_inc.media_disposition_against_index, and the batch twin
media_dedup_stream_replay (full DuckDB oracle) pins the index-growth
disposition semantics this module must reproduce.

Index layout under ``index_dir`` (hive-partitioned by write epoch):

- ``fp/epoch_id=<E>/``    — parquet (icid BIGINT, modality STRING,
  fp STRING): lowercase payload hex, the exact-dup probe side.
- ``bands/epoch_id=<E>/`` — parquet (icid BIGINT, modality STRING,
  phash BIGINT, band_idx INT, band_val BIGINT): the 4x16-bit phash
  band decomposition, the near-dup probe side (phash rides along for
  the exact Hamming verify — the media_index_build artifact carries it
  for the same reason).

``epoch_id=-1`` is the base generation (bootstrap and every compaction
rewrite); each micro-batch appends its survivors under its own
``epoch_id=<E>`` directory with mode("overwrite") — so a REPLAYED epoch
overwrites its own directory instead of duplicating rows (ADVICE r10:
plain mode("append") made replays inflate per-bucket counts toward
PHASH_BUCKET_CAP, silently disabling near-dup matching there). Index
appends are therefore idempotent under at-least-once foreachBatch
semantics; the disposition OUTPUT keeps the weaker posture of the text
twin (append + epoch_id column; readers drop replayed epochs — note a
replay that lands AFTER its survivors were folded into the index
re-emits those rows as exact-dup self-matches, so the two copies of an
epoch can disagree; exactly-once output is the table-format story, not
re-solved here).

Per-epoch directories are a small-files problem at crawl cadence, and
the probe join loses co-location as they accumulate —
``compact_media_index`` folds all epochs back into the base
generation, with ``bands/`` rewritten partitioned by
(modality, band_val) so probe joins co-locate; the stream loop calls
it every ``compact_every`` epochs. The swap is
write-tmp/rename-old/rename-tmp (crash leaves either the old or the
new generation plus a recoverable ``.old``); a real deployment does
this as one transaction in a table format like Delta/Iceberg.

At 100 TB the index is the big side and never shuffles: each probe
scans it once with the (small) micro-batch BROADCAST into every join.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tank_spark.llm.media_inc import (
    _bands,
    _hashed_media,
    media_disposition_against_index,
)
from tank_spark.streaming._swap import recover_interrupted_swap

# epoch_id is the hive partition column (parsed from the dir name, not
# stored in the files)
_FP_SCHEMA = "icid long, modality string, fp string, epoch_id long"
_BANDS_SCHEMA = ("icid long, modality string, phash long, "
                 "band_idx int, band_val long, epoch_id long")

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


def _write_index_epoch(spark: SparkSession, media: DataFrame,
                       index_dir: str, epoch_id: int) -> None:
    """One epoch's index rows, written idempotently: overwrite of the
    epoch's own directory, so a foreachBatch replay rewrites instead of
    duplicating."""
    _ensure_epoch_layout(index_dir, "fp")
    _ensure_epoch_layout(index_dir, "bands")
    fps, bands = media_fp_and_bands(spark, media)
    fps.select(F.col("cid").alias("icid"), "modality", "fp") \
        .write.mode("overwrite").parquet(_epoch_dir(index_dir, "fp", epoch_id))
    bands.select(F.col("cid").alias("icid"), "modality", "phash",
                 "band_idx", "band_val") \
        .write.mode("overwrite") \
        .parquet(_epoch_dir(index_dir, "bands", epoch_id))


def write_media_index(spark: SparkSession, media: DataFrame,
                      index_dir: str) -> None:
    """Materialize the initial corpus index (the base generation): the
    batch-mode bootstrap before the stream starts appending to it."""
    _write_index_epoch(spark, media, index_dir, BASE_EPOCH)


def read_media_index(spark: SparkSession,
                     index_dir: str) -> tuple[DataFrame, DataFrame]:
    """The current index relations across every generation/epoch
    (explicit schemas, as dedup_stream; epoch_id dropped — the probe
    is epoch-agnostic, idempotency lives in the directory layout)."""
    _ensure_epoch_layout(index_dir, "fp")
    _ensure_epoch_layout(index_dir, "bands")
    ifp = (spark.read.schema(_FP_SCHEMA)
           .parquet(os.path.join(index_dir, "fp")).drop("epoch_id"))
    ib = (spark.read.schema(_BANDS_SCHEMA)
          .parquet(os.path.join(index_dir, "bands")).drop("epoch_id"))
    return ifp, ib


def compact_media_index(spark: SparkSession, index_dir: str,
                        n_buckets: int = 32) -> None:
    """Fold every per-epoch append back into the base generation:
    ``bands/`` rewritten partitioned by (modality, band_val) — the probe
    join key — and sorted within partitions, ``fp/`` by (modality, fp).
    Fixes the two costs of epoch accumulation at crawl cadence: file
    count (one dir per epoch) and probe-side co-location (the banded
    probe join reads one co-partitioned relation again). Readers are
    the between-batches loop, so the tmp-write + rename swap below is
    safe here; production would run this as a table-format transaction.
    """
    ifp, ib = read_media_index(spark, index_dir)
    tmp_fp = os.path.join(index_dir, "fp.compact")
    tmp_bands = os.path.join(index_dir, "bands.compact")
    shutil.rmtree(tmp_fp, ignore_errors=True)
    shutil.rmtree(tmp_bands, ignore_errors=True)
    (ifp.repartition(n_buckets, "modality", "fp")
        .sortWithinPartitions("modality", "fp")
        .write.parquet(os.path.join(tmp_fp, f"epoch_id={BASE_EPOCH}")))
    (ib.repartition(n_buckets, "modality", "band_val")
       .sortWithinPartitions("modality", "band_idx", "band_val")
       .write.parquet(os.path.join(tmp_bands, f"epoch_id={BASE_EPOCH}")))
    for rel, tmp in (("fp", tmp_fp), ("bands", tmp_bands)):
        live = os.path.join(index_dir, rel)
        old = live + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(live, old)
        os.rename(tmp, live)
        shutil.rmtree(old)


def index_epoch_count(index_dir: str) -> int:
    """How many generations/epoch dirs the bands relation currently
    spans (compaction telemetry)."""
    root = os.path.join(index_dir, "bands")
    return sum(1 for d in os.listdir(root) if d.startswith("epoch_id="))


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
    compact_every: int = 0,
):
    """Wire the loop: for each micro-batch of (cid, modality, payload)
    media rows,

    1. disposition against the CURRENT index (read fresh per epoch —
       it grew by earlier epochs' appends),
    2. append the dispositions (+ epoch id) to ``out_dir``,
    3. write the new_unique survivors' fingerprints and phash bands to
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
        ifp, ib = read_media_index(spark, index_dir)
        disp = disposition_media_batch(spark, batch, ifp, ib) \
            .localCheckpoint(eager=True)
        disp.withColumn("epoch_id", F.lit(epoch_id).cast("long")) \
            .write.mode("append").parquet(out_dir)
        new_ids = disp.filter(F.col("disposition") == "new_unique") \
            .select(F.col("doc_id").alias("cid"))
        # skip the index write entirely when there are no survivors
        # (cheap: disp is checkpointed). Besides avoiding empty epoch
        # dirs, this is LOAD-BEARING for crash safety: if a crash lands
        # between compaction's fp/ and bands/ swaps, the replayed epoch
        # re-dispositions as all-dup against the already-folded side —
        # an unconditional overwrite would then replace the epoch's
        # only surviving band rows with an empty directory (review r11)
        if not new_ids.isEmpty():
            survivors = batch.join(F.broadcast(new_ids), "cid")
            _write_index_epoch(spark, survivors, index_dir, epoch_id)
        if compact_every and (epoch_id + 1) % compact_every == 0:
            compact_media_index(spark, index_dir)

    writer = (
        media_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def media_stream_report(spark: SparkSession, out_dir: str,
                        docs: DataFrame,
                        provenance: Column | None = None) -> DataFrame:
    """The daily curation report OFF THE PERSISTED disposition output —
    the production form of the registered media_dedup_stream_report
    (which re-derives the replay in one plan for the oracle gate): read
    ``out_dir`` (the loop's append sink), map doc_id to provenance
    ``orig`` (default: the corpus convention ``doc_id % INC_OFFSET``;
    a deployment passes its own id scheme), join the caller's ``docs``
    (orig, source) relation, and aggregate per
    (epoch_id, modality, source, disposition) through the SAME
    curation_report_over core as every registered report. Marginal
    daily cost at crawl cadence: one broadcast aggregate over that
    day's partition — no replay re-derivation."""
    from tank_spark.llm.media_inc import (
        INC_OFFSET,
        MEDIA_DISPOSITION_PRECEDENCE,
        collapse_replayed_epochs,
        curation_report_over,
    )

    # the 'readers drop replayed epochs' half of the output posture
    # (review r11: documented but previously unimplemented)
    disp = collapse_replayed_epochs(
        spark.read.parquet(out_dir), "doc_id",
        MEDIA_DISPOSITION_PRECEDENCE)
    orig = provenance if provenance is not None else (
        F.col("doc_id") % INC_OFFSET)
    disp = disp.select(orig.alias("orig"), "epoch_id", "modality",
                       "disposition", "match_cid")
    return curation_report_over(
        docs, disp, ["epoch_id", "modality", "source"])


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

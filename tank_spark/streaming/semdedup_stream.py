"""Streaming incremental SEMANTIC dedup: the production shape of
semdedup_incremental (llm/semdedup_inc.py) — an embedding feed arrives
as micro-batches of (vid, embedding) rows, each is dispositioned
against a PERSISTED semantic index (the semdedup_index_build artifact
shape: frozen-quantizer list assignment + hoisted inverse norm + the
vector itself), and every batch's new_unique survivors are appended to
the index before the next batch probes it.

This is the semantic sibling of streaming/dedup_stream.py and
streaming/media_dedup_stream.py, sharing their loop shape verbatim; the
probe logic is shared with the batch op via
semdedup_inc.semdedup_disposition_against_index, and the batch twin
semdedup_stream_replay (full DuckDB oracle) pins the index-growth
disposition semantics this module must reproduce.

Index layout under ``index_dir`` (hive-partitioned by write epoch):

- ``assign/epoch_id=<E>/`` — parquet (ivid BIGINT, list_id BIGINT,
  inv DOUBLE, embedding ARRAY<FLOAT>): one relation (the semantic
  family needs no separate exact-fingerprint side — an exact re-crawl
  IS a cosine-1 vector, caught by the same probe).

``epoch_id=-1`` is the base generation (bootstrap and every compaction
rewrite); each micro-batch appends its survivors under its own
``epoch_id=<E>`` directory with mode("overwrite") — a REPLAYED epoch
rewrites its own directory instead of duplicating rows, so index
appends are idempotent under at-least-once foreachBatch semantics
(the ADVICE r10 posture all three incremental families share). The
disposition OUTPUT keeps the weaker posture of the text/media twins
(append + epoch_id column; readers drop replayed epochs).

Per-epoch directories are a small-files problem at crawl cadence and
the probe join loses co-location as they accumulate —
``compact_semdedup_index`` folds every epoch back into the base
generation, rewritten partitioned by list_id (the probe join key) and
sorted within partitions; the loop calls it every ``compact_every``
epochs. The swap is write-tmp/rename-old/rename-tmp (crash leaves
either the old or the new generation plus a recoverable ``.old``); a
real deployment does this as one transaction in a table format.

At 100 TB the index is the big side and never shuffles on a probe key:
each probe scans only the batch's routed lists with the (small)
micro-batch BROADCAST into every join, and nlist scales with the
corpus (flat literal quantizer to ~10^3 lists, the frozen two-level
quantizer to ~10^5 — SCALE.md), keeping per-row probe cost bounded.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tank_spark.llm.semdedup_inc import (
    routed_relation,
    scored_relation,
    semdedup_disposition_against_index,
)
from tank_spark.streaming._swap import recover_interrupted_swap

# epoch_id is the hive partition column (parsed from the dir name, not
# stored in the files)
_ASSIGN_SCHEMA = ("ivid long, list_id long, inv double, "
                  "embedding array<float>, epoch_id long")

BASE_EPOCH = -1  # the bootstrap/compacted generation's directory


def _epoch_dir(index_dir: str, epoch_id: int) -> str:
    return os.path.join(index_dir, "assign", f"epoch_id={epoch_id}")


def _write_index_epoch(spark: SparkSession, vectors: DataFrame,
                       index_dir: str, epoch_id: int,
                       quantizer: str = "frozen") -> None:
    """One epoch's index rows — (vid, embedding) through the map-only
    scored projection, written idempotently (overwrite of the epoch's
    own directory, so a foreachBatch replay rewrites, never
    duplicates)."""
    rel = scored_relation(spark, vectors, quantizer).select(
        F.col("vid").alias("ivid"), "list_id", "inv", "embedding")
    rel.write.mode("overwrite").parquet(_epoch_dir(index_dir, epoch_id))


def write_semdedup_index(spark: SparkSession, vectors: DataFrame,
                         index_dir: str,
                         quantizer: str = "frozen") -> None:
    """Materialize the initial corpus index (the base generation): the
    batch-mode bootstrap before the stream starts appending to it.
    ``vectors`` is a (vid, embedding) relation. ``quantizer`` picks the
    list space ("frozen" k=8 or "twolevel" k=64 — at 100 TB the
    two-level form with nlist scaled to the corpus); every writer and
    prober of one index MUST use the same value."""
    _write_index_epoch(spark, vectors, index_dir, BASE_EPOCH, quantizer)


def read_semdedup_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """The current index relation across every generation/epoch —
    (vid, list_id, embedding, inv), the probe-core input shape
    (explicit schema; epoch_id dropped — the probe is epoch-agnostic,
    idempotency lives in the directory layout). A compaction swap
    interrupted between its two renames is auto-restored from the
    surviving ``.old`` generation first (ADVICE r11)."""
    recover_interrupted_swap(os.path.join(index_dir, "assign"))
    return (spark.read.schema(_ASSIGN_SCHEMA)
            .parquet(os.path.join(index_dir, "assign"))
            .select(F.col("ivid").alias("vid"), "list_id",
                    "embedding", "inv"))


def compact_semdedup_index(spark: SparkSession, index_dir: str,
                           n_buckets: int = 32) -> None:
    """Fold every per-epoch append back into the base generation,
    rewritten partitioned by list_id — the probe join key — and sorted
    within partitions. Fixes the two costs of epoch accumulation at
    crawl cadence: file count (one dir per epoch) and probe-side
    co-location."""
    idx = read_semdedup_index(spark, index_dir)
    tmp = os.path.join(index_dir, "assign.compact")
    shutil.rmtree(tmp, ignore_errors=True)
    (idx.select(F.col("vid").alias("ivid"), "list_id", "inv", "embedding")
        .repartition(n_buckets, "list_id")
        .sortWithinPartitions("list_id", "ivid")
        .write.parquet(os.path.join(tmp, f"epoch_id={BASE_EPOCH}")))
    live = os.path.join(index_dir, "assign")
    old = live + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(live, old)
    os.rename(tmp, live)
    shutil.rmtree(old)


def index_epoch_count(index_dir: str) -> int:
    """How many generations/epoch dirs the index currently spans
    (compaction telemetry)."""
    root = os.path.join(index_dir, "assign")
    return sum(1 for d in os.listdir(root) if d.startswith("epoch_id="))


def disposition_vector_batch(spark: SparkSession, batch: DataFrame,
                             index: DataFrame,
                             quantizer: str = "frozen") -> DataFrame:
    """Disposition one (vid, embedding) micro-batch against an index
    relation: (vec_id, list_id, disposition, match_vid, n_index_hits,
    best_index_cos) — the shared probe core. ``quantizer`` must match
    the one the index was written with."""
    scored = scored_relation(spark, batch, quantizer)
    routed = routed_relation(spark, batch, quantizer=quantizer)
    return semdedup_disposition_against_index(scored, routed, index)


def start_incremental_semdedup_stream(
    spark: SparkSession,
    vector_stream: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
    compact_every: int = 0,
    quantizer: str = "frozen",
):
    """Wire the loop: for each micro-batch of (vid, embedding) rows,

    1. disposition against the CURRENT index (read fresh per epoch —
       it grew by earlier epochs' appends),
    2. append the dispositions (+ epoch id) to ``out_dir``,
    3. write the new_unique survivors' scored rows to the index under
       the epoch's own directory (overwrite — replay idempotent),
    4. every ``compact_every`` epochs (0 = never), fold the per-epoch
       dirs back into one list_id-co-located base generation.

    Returns the started StreamingQuery. ``checkpoint_dir`` must live
    OUTSIDE any watched drop dir (standing gotcha)."""

    def _sink(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        # the batch feeds the probe twice (scored + routed) and the
        # survivor append — pin it so the source is read one time
        batch = batch.localCheckpoint(eager=True)
        index = read_semdedup_index(spark, index_dir)
        disp = disposition_vector_batch(spark, batch, index, quantizer) \
            .localCheckpoint(eager=True)  # consumed twice: out + survivors
        disp.withColumn("epoch_id", F.lit(epoch_id).cast("long")) \
            .write.mode("append").parquet(out_dir)
        new_ids = disp.filter(F.col("disposition") == "new_unique") \
            .select(F.col("vec_id").alias("vid"))
        # skip the index write when there are no survivors — avoids
        # empty epoch dirs AND keeps a replay that lands after its
        # survivors were folded into the base generation from
        # overwriting the epoch's only surviving rows with an empty
        # directory (the media twin's crash-safety argument)
        if not new_ids.isEmpty():
            survivors = batch.join(F.broadcast(new_ids), "vid")
            _write_index_epoch(spark, survivors, index_dir, epoch_id,
                               quantizer)
        if compact_every and (epoch_id + 1) % compact_every == 0:
            compact_semdedup_index(spark, index_dir)

    writer = (
        vector_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def semdedup_stream_report(spark: SparkSession, out_dir: str,
                           docs: DataFrame,
                           provenance: Column | None = None) -> DataFrame:
    """The daily curation report OFF THE PERSISTED disposition output —
    the production form of the registered semdedup_stream_report
    (which re-derives the replay in one plan for the oracle gate):
    read ``out_dir``, map vec_id to provenance ``orig`` (default: the
    corpus convention ``vec_id % INC_OFFSET``), join the caller's
    ``docs`` (orig, label) relation, and aggregate per
    (epoch_id, label, disposition) through the SAME
    curation_report_over core as every registered report."""
    from tank_spark.llm.media_inc import (
        collapse_replayed_epochs,
        curation_report_over,
    )
    from tank_spark.llm.semdedup_inc import INC_OFFSET

    disp = collapse_replayed_epochs(
        spark.read.parquet(out_dir), "vec_id",
        ["semantic_dup_of_index", "dup_in_batch", "new_unique"])
    orig = provenance if provenance is not None else (
        F.col("vec_id") % INC_OFFSET)
    disp = disp.select(orig.alias("orig"), "epoch_id", "disposition",
                       F.col("match_vid").alias("match_cid"))
    return curation_report_over(docs, disp, ["epoch_id", "label"])


def vector_file_stream(spark: SparkSession, drop_dir: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """A (vid, embedding) file stream over a parquet drop dir — one
    file per micro-batch by default, so each dropped file IS a crawl
    increment's embedding batch."""
    schema = T.StructType([
        T.StructField("vid", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(drop_dir)
    )

"""Writable feature-table management: the mutation side of CRUD
(reference SURVEY.md §2.2) as parquet rewrites.

The reference mutates Cassandra rows in place (DELETE/re-INSERT,
application.kt:302-348, 476-520). On an immutable columnar store the same
semantics are copy-on-write: rewrite only the partitions whose rows change
— exactly what Delta/Iceberg row-level operations do; this module is the
dependency-free parquet version, bucket-partitioned so a mutation touches
one ``bucket=`` directory, not the table.

Layout: ``<dir>/bucket=<hash % n_buckets>/*.parquet``. The read path
filters on ``bucket`` (derived from ``hash``), so tile queries prune
directories — the on-disk analogue of the reference's partition key, and
of what a 100 TB deployment gets from hash-bucketed table layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS = 64


def write_feature_table(df: DataFrame, table_dir: str, n_buckets: int = N_BUCKETS) -> None:
    """Materialize a feature DataFrame as a bucket-partitioned parquet
    table, sorted by hash within partitions (row-group skipping)."""
    (
        df.withColumn("bucket", F.pmod(F.col("hash"), F.lit(n_buckets)))
        .repartition(F.col("bucket"))
        .sortWithinPartitions("hash")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(table_dir)
    )


def read_feature_table(spark: SparkSession, table_dir: str) -> DataFrame:
    return spark.read.parquet(table_dir)


def _buckets_of(pred_buckets: list[int]) -> Column:
    return F.col("bucket").isin(pred_buckets)


def delete_where(spark: SparkSession, table_dir: str, predicate: Column,
                 candidate_buckets: list[int] | None = None) -> int:
    """DELETE WHERE: rewrite only the buckets that can contain matches
    (copy-on-write, like Delta DELETE). Returns rows deleted.

    ``candidate_buckets``: bucket pruning hint (e.g. from a hash range);
    None = check all buckets for matches first, rewrite only dirty ones.
    """
    df = read_feature_table(spark, table_dir)
    hit = df.filter(predicate)
    if candidate_buckets is None:
        candidate_buckets = [
            r["bucket"] for r in hit.select("bucket").distinct().collect()
        ]
    if not candidate_buckets:
        return 0
    n_deleted = hit.count()
    if n_deleted == 0:
        return 0
    # localCheckpoint CUTS LINEAGE: a plain cache() can silently recompute
    # from source files we are about to overwrite (observed: FileNotFound
    # mid-rewrite). Eager checkpoint = durable copy of the survivors.
    survivors = (
        df.filter(_buckets_of(candidate_buckets))
        .filter(~predicate)
        .localCheckpoint(eager=True)
    )
    for b in candidate_buckets:
        (
            survivors.filter(F.col("bucket") == b).drop("bucket")
            .sortWithinPartitions("hash")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{table_dir}/bucket={b}")
        )
    survivors.unpersist()
    spark.catalog.refreshByPath(table_dir)
    return n_deleted


def delete_by_uid(spark: SparkSession, table_dir: str, uid: str) -> int:
    """C2: read the row to find its partition, delete within it
    (reference application.kt:302-315 does the same read-then-delete)."""
    df = read_feature_table(spark, table_dir)
    rows = df.filter(F.col("uid") == uid).select("bucket").collect()
    if not rows:
        return 0
    return delete_where(
        spark, table_dir, F.col("uid") == uid,
        candidate_buckets=sorted({r["bucket"] for r in rows}),
    )


def delete_tile(spark: SparkSession, table_dir: str, z: int, x: int, y: int) -> int:
    """C4: partition delete for a tile's Morton range
    (reference application.kt:476-520), bucket-pruned."""
    from tank_spark.operators.tiles import tile_hash_range

    lo, hi = tile_hash_range(z, x, y)
    cand = sorted({h % N_BUCKETS for h in range(lo, hi + 1)}) if hi - lo < 4096 else None
    return delete_where(
        spark, table_dir, F.col("hash").between(lo, hi), candidate_buckets=cand
    )


def delete_matching_keys(spark: SparkSession, table_dir: str,
                         keys: DataFrame) -> int:
    """Upsert support: delete every stored row whose (hash, uid) appears
    in ``keys`` — the Cassandra INSERT-is-upsert semantic for a layer
    configured WITHOUT timestamp in its clustering key (reference
    application.conf:47-50: partition_keys="hash",
    primary_keys="uid" variant; with the default "uid, timestamp"
    clustering every ingest is a new version and no delete happens —
    that default is the plain append path).

    Bucket-pruned CoW like delete_where, but matching via a broadcast
    LEFT SEMI/ANTI join on the (bounded, one-ingest-batch) key set
    instead of a literal predicate — thousands of keys would explode an
    isin expression tree. Returns rows deleted."""
    df = read_feature_table(spark, table_dir)
    k = keys.select("hash", "uid").distinct().localCheckpoint(eager=True)
    try:
        cand = sorted({
            r["b"]
            for r in k.select(
                F.pmod(F.col("hash"), F.lit(N_BUCKETS)).alias("b")
            ).distinct().collect()
            if r["b"] is not None
        })
        if not cand:
            return 0
        scoped = df.filter(_buckets_of(cand))
        hit = scoped.join(F.broadcast(k), ["hash", "uid"], "left_semi")
        dirty = sorted({r["bucket"] for r in hit.select("bucket").distinct().collect()})
        if not dirty:
            return 0
        n_deleted = hit.count()
        survivors = (
            df.filter(_buckets_of(dirty))
            .join(F.broadcast(k), ["hash", "uid"], "left_anti")
            .localCheckpoint(eager=True)  # cut lineage before overwrite
        )
        for b in dirty:
            (
                survivors.filter(F.col("bucket") == b).drop("bucket")
                .sortWithinPartitions("hash")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(f"{table_dir}/bucket={b}")
            )
        survivors.unpersist()
        spark.catalog.refreshByPath(table_dir)
        return n_deleted
    finally:
        k.unpersist()


def compact_table(spark: SparkSession, table_dir: str,
                  min_files: int = 2) -> dict[int, int]:
    """Compaction: rewrite every bucket fragmented into >= ``min_files``
    parquet files as one hash-sorted file. Streaming/bulk ingest appends
    one file per micro-batch per bucket (streaming/ingest.py), so an
    ingest-heavy table degrades into many small row groups — the classic
    small-files problem; this is the OPTIMIZE/rewrite_data_files analogue
    (and the Cassandra-compaction parity point: the reference's store
    compacts SSTables in the background, application.conf's cluster side).

    Returns {bucket: n_files_before} for the buckets rewritten.

    At 100 TB: each bucket rewrite is an independent coalesce-and-sort of
    one directory — schedulable bucket-by-bucket (here: a loop, on a
    cluster: parallel jobs), never a full-table shuffle. File listing
    uses the local filesystem; a cluster deployment swaps in the Hadoop
    FileSystem API, the rewrite is unchanged.
    """
    import os

    fragmented: dict[int, int] = {}
    for entry in sorted(os.listdir(table_dir)):
        if not entry.startswith("bucket="):
            continue
        files = [
            f for f in os.listdir(os.path.join(table_dir, entry))
            if f.endswith(".parquet")
        ]
        if len(files) >= min_files:
            fragmented[int(entry.split("=", 1)[1])] = len(files)
    for b in fragmented:
        part_dir = f"{table_dir}/bucket={b}"
        # checkpoint cuts lineage from the files about to be overwritten
        # (same FileNotFound hazard as delete_where)
        rows = spark.read.parquet(part_dir).localCheckpoint(eager=True)
        (
            rows.coalesce(1)
            .sortWithinPartitions("hash")  # coalesce first -> globally sorted file
            .write.mode("overwrite")
            .parquet(part_dir)
        )
        rows.unpersist()
    if fragmented:
        spark.catalog.refreshByPath(table_dir)
    return fragmented


def update_by_uid(spark: SparkSession, table_dir: str, uid: str,
                  updates: dict[str, object]) -> int:
    """C3: update = delete + re-insert under the same uid (the reference's
    read-copy-reinsert, application.kt:317-348) — here a single-bucket
    copy-on-write rewrite with CASE-d columns. uid is a clustering key,
    not unique (reference PK ((hash), uid, timestamp)): every row carrying
    the uid is updated; the count of touched rows is returned."""
    df = read_feature_table(spark, table_dir)
    rows = df.filter(F.col("uid") == uid).select("bucket").collect()
    if not rows:
        return 0
    buckets = sorted({r["bucket"] for r in rows})
    hit = F.col("uid") == uid
    target = df.filter(_buckets_of(buckets))
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    for col, val in updates.items():
        # cast the literal to the COLUMN's type: when/otherwise would
        # otherwise coerce a typed column (int/date attr) up to string and
        # silently rewrite the bucket with a drifted schema
        lit = F.lit(val).cast(dtypes[col])
        target = target.withColumn(col, F.when(hit, lit).otherwise(F.col(col)))
    target = target.localCheckpoint(eager=True)  # cut lineage before overwrite
    for b in buckets:
        (
            target.filter(F.col("bucket") == b).drop("bucket")
            .sortWithinPartitions("hash")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{table_dir}/bucket={b}")
        )
    target.unpersist()
    spark.catalog.refreshByPath(table_dir)
    return len(rows)

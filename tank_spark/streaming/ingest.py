"""Streaming bulk ingest — the reference's spool-file pipeline (S2/S5/S6,
reference application.kt:245-277, FileWaitGroup.kt, Tyler.kt) re-expressed
as Structured Streaming.

Reference semantics preserved:
* drop a file of newline-delimited feature JSON into a directory; ingest
  proceeds asynchronously (HTTP 202 ~ non-blocking stream trigger);
* schema coercion with per-type defaults (Tyler.kt:77-116);
* un-coercible rows go to a rejects sink instead of failing the batch
  (the "Exhauster" dead-letter, Tyler.kt:152-169 — here a rejects table);
* every accepted row gets centroid -> zoom-13 tile -> Morton ``hash``
  (Tyler.kt:127-131) and a server-assigned ingest timestamp;
* the ``.lock``-file work-queue protocol (FileWaitGroup.kt:19-73) is
  replaced by checkpointing + exactly-once file-source semantics, and
  ``maxFilesPerTrigger`` plays the max-2-concurrent-runners role.

At scale: the same topology runs against a cloud bucket with thousands of
arriving files; foreachBatch appends hash-partitioned parquet so the read
path gets partition pruning on ``hash``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tank_spark.geom.morton import morton_col
from tank_spark.sources.features import HASH_LEVEL

# wire schema of one NDJSON feature (GeoJSON-ish, flattened properties —
# the reference's configured attr_fields, application.conf:51)
FEATURE_JSON_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("lon", T.DoubleType()),
    T.StructField("lat", T.DoubleType()),
    T.StructField("kind", T.StringType()),
    T.StructField("score", T.StringType()),   # arrives untyped; coerced below
    T.StructField("cnt", T.StringType()),
    T.StructField("tag", T.StringType()),
])


def coerce_features(raw: DataFrame) -> DataFrame:
    """Schema application with lenient coercion + defaults (I1) and a
    ``rejected`` flag for the dead-letter split (S6). Pure column exprs.

    Emits the FULL serve-path column set (key, tile_x/tile_y, ts, qty,
    geometry) so appended rows are schema-compatible with the feature
    table the tile/MVT read path scans — the reference likewise stores the
    complete row (geometry WKT included) at ingest (Tyler.kt: the bound
    INSERT sets geometry alongside hash/uid/attrs)."""
    score = F.col("score").try_cast("double")
    cnt = F.col("cnt").try_cast("int")
    ok_geo = F.col("lon").isNotNull() & F.col("lat").isNotNull()
    df = raw.select(
        F.coalesce(F.col("id"), F.expr("uuid()")).alias("uid"),
        "lon", "lat",
        F.coalesce(F.col("kind"), F.lit("")).alias("kind"),
        F.coalesce(score, F.lit(0.0)).alias("score"),     # defaults: Tyler.kt:106-116
        F.coalesce(cnt, F.lit(0)).alias("cnt"),
        F.coalesce(F.col("tag"), F.lit("")).alias("tag"),
        (
            (F.col("score").isNotNull() & score.isNull())
            | (F.col("cnt").isNotNull() & cnt.isNull())
            | ~ok_geo
        ).alias("rejected"),
    )
    # centroid -> slippy tile -> Morton hash (points: centroid == point)
    n = 1 << HASH_LEVEL
    xt = F.least(
        F.greatest(F.floor((F.col("lon") + 180.0) / 360.0 * n), F.lit(0)), F.lit(n - 1)
    )
    yt = F.least(
        F.greatest(
            F.floor(
                (1.0 - F.asinh(F.tan(F.radians(F.col("lat")))) / math.pi) / 2.0 * n
            ),
            F.lit(0),
        ),
        F.lit(n - 1),
    )
    df = df.withColumns({
        "hash": F.when(F.col("rejected"), F.lit(None)).otherwise(morton_col(xt, yt)),
        "tile_x": F.when(F.col("rejected"), F.lit(None)).otherwise(xt.cast("long")),
        "tile_y": F.when(F.col("rejected"), F.lit(None)).otherwise(yt.cast("long")),
        # synthetic non-negative feature key (MVT ids are uint64); the
        # derived table's keys are < 2^40, so the 2^62 domain can't collide
        # with them in practice and stays sign-safe
        "key": F.pmod(F.xxhash64(F.col("uid")), F.lit(1 << 62)),
        # server-assigned ingest timestamp (Tyler.kt:39) — same role the
        # derived table's ts column plays, so appends stay schema-identical
        "ts": F.current_timestamp().cast("timestamp_ntz"),
        "qty": F.lit(0.0),
        "geometry": F.when(
            ok_geo,
            F.concat(F.lit("POINT ("), F.col("lon").cast("string"), F.lit(" "),
                     F.col("lat").cast("string"), F.lit(")")),
        ),
    })
    # serve-path column order (sources/features.py schema) + ingest extras
    return df.select(
        "key", "uid", "tile_x", "tile_y", "ts", "qty", "hash", "kind",
        "score", "cnt", "tag", "lon", "lat", "geometry", "rejected",
    )


def start_ingest_stream(
    spark: SparkSession,
    drop_dir: str,
    table_dir: str,
    rejects_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 2,
):
    """Start the drop-dir ingest stream. Returns the StreamingQuery.

    foreachBatch writes accepted rows to ``table_dir`` (parquet) and
    rejects to ``rejects_dir`` in the same epoch — the one-pass
    valid/dead-letter split the reference does per feature.
    """
    raw = (
        spark.readStream.schema(FEATURE_JSON_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(drop_dir)
    )
    coerced = coerce_features(raw)

    def sink(batch: DataFrame, epoch_id: int) -> None:
        batch.persist()
        try:
            # bucket-partitioned append, mirroring ingest_features — the
            # table dir layout is bucket=N/ subdirs; flat files at the root
            # would break partition discovery and the mutation paths that
            # filter on `bucket`
            (batch.filter(~F.col("rejected")).drop("rejected")
             .withColumn("bucket", F.pmod(F.col("hash"), F.lit(64)))
             .write.mode("append").partitionBy("bucket").parquet(table_dir))
            rejects = batch.filter(F.col("rejected")).drop("rejected", "hash")
            if rejects.limit(1).count() > 0:
                rejects.write.mode("append").parquet(rejects_dir)
        finally:
            batch.unpersist()

    return (
        coerced.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

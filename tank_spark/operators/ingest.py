"""Ingest-side operators (reference SURVEY.md §2.5): schema coercion with
defaults, dead-letter routing, JSON property extraction, and the
centroid -> tile -> Morton bucketing assignment.

Reference behavior being reproduced (Tyler.kt:67-125): declared-type
coercion is lenient (wrong runtime type coerced when possible), missing or
un-coercible values fall back to per-type defaults (0 / 0.0 / ''), and
truly bad rows route to a rejects sink instead of failing the batch.

Spark-first shape: ``try_cast`` + ``coalesce`` column expressions — ANSI
mode stays on, nothing throws, everything stays in whole-stage codegen. The
rejects path is the same scan with the inverted predicate (a real pipeline
writes both from one pass via ``foreachBatch``; see streaming/ingest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tank_spark.plans.registry import register
from tank_spark.sources.features import FEATURES_CTE, features_df
from tank_spark.sources.tables import read_events


@register(
    "ingest_json_props",
    "SELECT event_id, user_id, event_type, "
    "COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER), 0) AS k_val "
    "FROM events",
    doc="I1/S6: JSON property extraction with typed coercion + default "
        "(reference Tyler.kt:77-116 semantics on a JSON props payload)",
)
def ingest_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events(spark, sf_dir)
    return ev.select(
        "event_id", "user_id", "event_type",
        F.coalesce(
            F.get_json_object("props", "$.k").try_cast("int"), F.lit(0)
        ).alias("k_val"),
    )


@register(
    "ingest_coerce_defaults",
    "SELECT event_id, "
    "COALESCE(TRY_CAST(event_type AS DOUBLE), 0.0) AS et_num, "
    "COALESCE(TRY_CAST(CAST(value AS VARCHAR) AS DOUBLE), 0.0) AS val_num, "
    "CASE WHEN TRY_CAST(event_type AS DOUBLE) IS NULL THEN 1 ELSE 0 END AS rejected "
    "FROM events",
    doc="I1: lenient coercion with per-type defaults; `rejected` marks rows "
        "the reference would dead-letter (Tyler.kt:152-169)",
)
def ingest_coerce_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events(spark, sf_dir)
    et_num = F.col("event_type").try_cast("double")
    # string->double round-trip: the reference coerces String->Double the
    # same way (Tyler.kt:84-92)
    val_num = F.col("value").cast("string").try_cast("double")
    return ev.select(
        "event_id",
        F.coalesce(et_num, F.lit(0.0)).alias("et_num"),
        F.coalesce(val_num, F.lit(0.0)).alias("val_num"),
        F.when(et_num.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("rejected"),
    )


@register(
    "ingest_bucket_stats",
    f"{FEATURES_CTE} SELECT hash, COUNT(*) AS n, COUNT(DISTINCT kind) AS n_kinds, "
    f"CAST(SUM(cnt) AS BIGINT) AS sum_cnt FROM features GROUP BY hash",
    doc="I2-I4: the ingest bucketing invariant — every feature lands in one "
        "zoom-13 Morton bucket; per-bucket stats (partition health view)",
)
def ingest_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        features_df(spark, sf_dir)
        .groupBy("hash")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("kind").alias("n_kinds"),
            F.sum("cnt").alias("sum_cnt"),
        )
    )

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
from tank_spark.sources.tables import load, read_events


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
    "ingest_declared_schema",
    """
    WITH raw AS (
      SELECT key,
        CASE WHEN key % 13 = 0 THEN NULL
             ELSE CAST(key % 20 AS VARCHAR) END AS cnt,
        CASE WHEN key % 11 = 0 THEN 'oops'
             ELSE CAST((key % 1000) / 10.0 AS VARCHAR) END AS score,
        'L' || CAST(key % 17 AS VARCHAR) AS label,
        CASE WHEN key % 7 = 0 THEN 'not-a-date'
             WHEN key % 19 = 0 THEN NULL
             ELSE CAST(CAST(l_shipdate AS DATE) AS VARCHAR) END AS ship
      FROM (SELECT l_orderkey * 8 + l_linenumber AS key, l_shipdate
            FROM lineitem)
    )
    SELECT key,
      COALESCE(TRY_CAST(cnt AS INTEGER), 0) AS cnt,
      COALESCE(TRY_CAST(score AS DOUBLE), 0.0) AS score,
      COALESCE(label, '') AS label,
      COALESCE(TRY_CAST(ship AS DATE), DATE '1970-01-01') AS ship,
      CASE WHEN (cnt IS NOT NULL AND TRY_CAST(cnt AS INTEGER) IS NULL)
            OR (score IS NOT NULL AND TRY_CAST(score AS DOUBLE) IS NULL)
            OR (ship IS NOT NULL AND TRY_CAST(ship AS DATE) IS NULL)
           THEN 1 ELSE 0 END AS rejected
    FROM raw
    """,
    doc="I1 full parity: config-declared attr schema "
        "('cnt int, score double, label text, ship date') generates the "
        "coercion — per-type defaults 0/0.0/''/1970-01-01 for missing "
        "values (Tyler.kt:106-116), dead-letter flag for present-but-"
        "uncoercible values (wrong-type score, malformed date). The wire "
        "rows are synthesized deterministically from lineitem with "
        "seeded missing/malformed values.",
)
def ingest_declared_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tank_spark.streaming.ingest import attr_coercion

    li = load(spark, sf_dir, "lineitem")
    key = (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("long")
    wire = li.select(
        key.alias("key"),
        F.when(key % 13 == 0, F.lit(None))
         .otherwise((key % 20).cast("string")).alias("cnt"),
        F.when(key % 11 == 0, F.lit("oops"))
         .otherwise(((key % 1000) / F.lit(10.0)).cast("string")).alias("score"),
        F.concat(F.lit("L"), (key % 17).cast("string")).alias("label"),
        F.when(key % 7 == 0, F.lit("not-a-date"))
         .when(key % 19 == 0, F.lit(None))
         .otherwise(F.col("l_shipdate").cast("date").cast("string")).alias("ship"),
    )
    values, rejected = attr_coercion(
        "cnt int, score double, label text, ship date"
    )
    return wire.select(
        "key",
        *[expr.alias(name) for name, expr in values.items()],
        rejected.cast("int").alias("rejected"),
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


# ---------------------------------------------------------------- upsert

# A (uid, hash) pair present at every test SF (1 stored version at
# sf0.001/sf0.01, 2 at sf0.1 — so the driver row also exercises the
# replace-ALL-versions semantic), plus the zoom-13 tile-center lon/lat
# that re-hashes to the same Morton bucket. Verified against all three
# testdata dirs at registration time of this query.
_UPS_UID = "feat-10002"
_UPS_HASH = 11608996          # morton(z13 tile 1298, 3164)
_UPS_LON, _UPS_LAT = -122.93701171875, 37.84015683604134


@register(
    "ingest_upsert_post_state",
    f"""
    {FEATURES_CTE}
    SELECT uid, kind, score, cnt, tag FROM features
    WHERE hash = {_UPS_HASH} AND uid <> '{_UPS_UID}'
    UNION ALL
    SELECT '{_UPS_UID}', 'poi', CAST(123.5 AS DOUBLE),
           CAST(7 AS INTEGER), 'upserted'
    UNION ALL
    SELECT 'ups-new', 'road', CAST(1.5 AS DOUBLE),
           CAST(2 AS INTEGER), 'fresh'
    """,
    doc="S1 upsert parity (reference application.conf:47-50, the "
        "primary_keys='uid' INSERT-is-upsert layer): seeds a real "
        "bucket-partitioned table with one Morton bucket of the features "
        "table, ingests a conflicting batch through the ACTUAL API write "
        "path (Tank.ingest_features(upsert=True) -> "
        "table_ops.delete_matching_keys bucket-pruned CoW), and returns "
        "the post-state rows of the bucket — the stored versions of the "
        "conflicting uid are replaced by the incoming row, the fresh uid "
        "appends. The oracle states the same post-state declaratively.",
)
def ingest_upsert_post_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import json
    import shutil
    import tempfile

    from tank_spark.api import Tank
    from tank_spark.operators.table_ops import write_feature_table

    # fresh dir per call so the query is re-runnable; the dir must outlive
    # this function (the returned DataFrame reads it lazily) but not the
    # process — atexit reclaims it, and the AssertionError path reclaims
    # it immediately (ADVICE r6: repeated driver runs were accumulating
    # unbounded temp-dir litter).
    root = tempfile.mkdtemp(prefix="tank_upsert_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    d = root + "/layer"
    try:
        write_feature_table(
            features_df(spark, sf_dir).drop("ts").filter(F.col("hash") == _UPS_HASH), d
        )
        t = Tank(spark, d)
        base = {"lon": _UPS_LON, "lat": _UPS_LAT}
        res = t.ingest_features([
            json.dumps({"id": _UPS_UID, "kind": "poi", "score": "123.5",
                        "cnt": "7", "tag": "upserted", **base}),
            json.dumps({"id": "ups-new", "kind": "road", "score": "1.5",
                        "cnt": "2", "tag": "fresh", **base}),
        ], upsert=True)
        if res["accepted"] != 2 or res["rejected"] != 0:
            raise AssertionError(f"upsert ingest did not accept cleanly: {res}")
    except BaseException:
        shutil.rmtree(root, ignore_errors=True)
        raise
    return (
        t.features()
        .filter(F.col("hash") == _UPS_HASH)
        .select("uid", "kind", "score", "cnt", "tag")
    )

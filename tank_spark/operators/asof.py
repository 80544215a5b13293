"""As-of join and range join — operators Spark lacks natively, built as
compositions of DataFrame ops (the preferred strategy before reaching for
pandas kernels).

**As-of join** (``left`` row matches the latest ``right`` row with
``right.ts <= left.ts`` per key): implemented with the union-window trick —
tag both sides, union, one window sorted by (ts, side) per key,
``last_value(ignorenulls)`` carries the most recent right-side attributes
forward onto left rows. ONE shuffle on the key (vs. pandas
``merge_asof`` per group, which would ship both sides through Python).
The DuckDB oracle uses its native ``ASOF JOIN`` — an independent
implementation agreeing on results.

**Range join** (value BETWEEN lo AND hi against a bands table): for
uniform bands the range predicate is rewritten to an equi-join on the
computed band id — turning an O(n*m) nested-loop join into a hash join.
This is the bucketize-the-range-key pattern; non-uniform ranges would
bucketize at the finest granularity and post-filter.

Scale: both stay shuffle-bounded on their keys; neither materializes a
cross product. Skewed keys (one hot user) are AQE's skew-join case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tank_spark.plans.registry import register
from tank_spark.sources.tables import read_events


def asof_join(
    left: DataFrame, right: DataFrame, key: str,
    left_ts: str, right_ts: str, right_vals: list[str],
) -> DataFrame:
    """Generic as-of join: left rows + latest right_vals at-or-before
    left_ts per key (inclusive). Right side must be unique per
    (key, right_ts) for deterministic results — pre-aggregate if not."""
    l_tag = left.select(
        F.col(key).alias("_k"), F.col(left_ts).alias("_t"), F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_vals],
    )
    r_tag = right.select(
        F.col(key).alias("_k"), F.col(right_ts).alias("_t"), F.lit(0).alias("_side"),
        F.lit(None).cast(
            l_tag.schema["_l"].dataType
        ).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in right_vals],
    )
    # right rows sort BEFORE left rows at equal ts (side 0 < 1) -> inclusive
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "_k", "_t", "_side", "_l",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}")
            for c in right_vals
        ],
    )
    out = carried.filter(F.col("_side") == 1).select(
        F.col("_l.*"), *[F.col(f"_r_{c}").alias(f"asof_{c}") for c in right_vals]
    )
    return out


@register(
    "asof_purchase_last_click",
    """
    WITH p AS (
      SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t, value
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (  -- unique per (user_id, t): keep max event_id on ties
      SELECT user_id, t, MAX(click_id) AS click_id FROM (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t, event_id AS click_id
        FROM events WHERE event_type = 'click'
      ) GROUP BY user_id, t
    )
    SELECT p.event_id, p.user_id, p.t, p.value,
           c.click_id AS asof_click_id, c.t AS asof_click_t
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.t >= c.t
    """,
    doc="As-of join: each purchase matched to the user's latest click at "
        "or before it. Union-window implementation (one shuffle) checked "
        "against DuckDB's native ASOF JOIN.",
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value",
        F.unix_micros("ts").alias("t"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "t", "value"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("t").alias("t"))
        .agg(F.max("event_id").alias("click_id"))
        .select("user_id", "t", "click_id")
    )
    joined = asof_join(
        purchases, clicks, key="user_id", left_ts="t", right_ts="t",
        right_vals=["click_id", "t"],
    )
    return joined.select(
        "event_id", "user_id", "t", "value",
        F.col("asof_click_id"), F.col("asof_t").alias("asof_click_t"),
    )


BAND_W = 25.0  # uniform value bands


@register(
    "range_join_value_bands",
    f"""
    WITH bands AS (
      SELECT band_id, band_id * {BAND_W} AS lo, (band_id + 1) * {BAND_W} AS hi
      FROM (SELECT unnest(generate_series(0, 13)) AS band_id)
    )
    SELECT b.band_id, COUNT(*) AS n, MIN(e.value) AS min_v, MAX(e.value) AS max_v
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band_id
    """,
    doc="Range join via band bucketization: the BETWEEN predicate against "
        "uniform bands becomes an equi-join on floor(value/width) — hash "
        "join, not nested-loop. Oracle keeps the naive range-predicate "
        "form as the independent twin.",
)
def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events(spark, sf_dir)
    bands = spark.range(0, 14).select(F.col("id").alias("band_id"))
    e = ev.withColumn("band_id", F.floor(F.col("value") / F.lit(BAND_W)))
    return (
        e.join(F.broadcast(bands), "band_id")
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
    )

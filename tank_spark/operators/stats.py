"""Statistical aggregates with cross-engine-exact formulations.

Pearson correlation is normally order-dependent (floating sums of
products); here every component sum runs over fixed-point integers in
DECIMAL(38,0) (exact, order-independent, no int64 overflow for the
products), and only the final closed-form combination happens in doubles
— the identical expression in both engines. The same pattern yields
stddev/covariance. At 100 TB this matters twice: the sums stay mergeable
partial aggregates, and the result doesn't depend on partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tank_spark.plans.registry import register
from tank_spark.sources.tables import load

_D38 = "decimal(38,0)"


def _corr_cols():
    xc = F.round(F.col("l_quantity") * 100, 0).cast("long")
    yc = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    return {
        "n": F.count(F.lit(1)),
        "sx": F.sum(xc.cast(_D38)),
        "sy": F.sum(yc.cast(_D38)),
        "sxx": F.sum((xc * xc).cast(_D38)),
        "syy": F.sum((yc.cast(_D38) * yc.cast(_D38))),
        "sxy": F.sum((xc.cast(_D38) * yc.cast(_D38))),
    }


_CORR_SQL_SUMS = """
  COUNT(*) AS n,
  SUM(CAST(xc AS DECIMAL(38,0))) AS sx,
  SUM(CAST(yc AS DECIMAL(38,0))) AS sy,
  SUM(CAST(xc * xc AS DECIMAL(38,0))) AS sxx,
  SUM(CAST(yc AS DECIMAL(38,0)) * CAST(yc AS DECIMAL(38,0))) AS syy,
  SUM(CAST(xc AS DECIMAL(38,0)) * CAST(yc AS DECIMAL(38,0))) AS sxy
"""

_COMBINE_SQL = """
  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
"""


@register(
    "corr_qty_price_by_flag",
    f"""
    SELECT l_returnflag, corr_qty_price, n FROM (
      SELECT l_returnflag, {_COMBINE_SQL} AS corr_qty_price, n FROM (
        SELECT l_returnflag, {_CORR_SQL_SUMS}
        FROM (SELECT l_returnflag,
                     CAST(ROUND(l_quantity * 100, 0) AS BIGINT) AS xc,
                     CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS yc
              FROM lineitem)
        GROUP BY l_returnflag
      )
    )
    """,
    doc="Pearson correlation (quantity vs price) per return flag from "
        "exact fixed-point component sums — order-independent, so the "
        "value is identical under any partitioning and in any engine.",
)
def corr_qty_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    sums = li.groupBy("l_returnflag").agg(
        *[c.alias(k) for k, c in _corr_cols().items()]
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"), F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return sums.select("l_returnflag", corr.alias("corr_qty_price"), "n")


@register(
    "stddev_value_by_type",
    """
    SELECT event_type,
           sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) AS sd_value,
           CAST(sx AS DOUBLE) / 100.0 / n AS mean_value, n
    FROM (
      SELECT event_type, COUNT(*) AS n,
             SUM(CAST(xc AS DECIMAL(38,0))) AS sx,
             SUM(CAST(xc * xc AS DECIMAL(38,0))) AS sxx
      FROM (SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS xc
            FROM events)
      GROUP BY event_type
    )
    """,
    doc="Sample stddev + mean per event type from exact component sums "
        "(sd in cents scale cancels: sqrt over cents^2 / 100 = value "
        "units x 100; reported in cents-consistent units both sides).",
)
def stddev_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tank_spark.sources.tables import read_events

    e = read_events(spark, sf_dir)
    xc = F.round(F.col("value") * 100, 0).cast("long")
    sums = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xc.cast(_D38)).alias("sx"),
        F.sum((xc * xc).cast(_D38)).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx, sxx = F.col("sx").cast("double"), F.col("sxx").cast("double")
    sd = F.sqrt((n * sxx - sx * sx) / (n * (n - 1)))
    return sums.select(
        "event_type", sd.alias("sd_value"),
        (sx / 100.0 / F.col("n")).alias("mean_value"), "n",
    )

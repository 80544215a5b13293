"""Standard relational operator coverage.

The reference implements NONE of these (verified absence list, SURVEY.md
§2.11: no joins, sorts, grouping sets, windows, set ops, subqueries). They
are part of this engine's surface because Spark SQL provides them and the
north star extends the reference into a general analytics engine. Shapes
follow the public TPC-H queries where one fits the driver's star schema.

Exactness discipline for oracle parity: every floating-point aggregate is
computed over DECIMAL-cast inputs (exact, order-independent) and cast back
to DOUBLE at the end — a parallel Spark sum and a sequential DuckDB sum of
doubles could otherwise differ in the last ulp and fail the value hash.
``_dsum`` encapsulates the pattern.

Scale notes (100 TB posture), per query in its docstring; the common ones:
dimension joins broadcast (region/nation/customer-side aggregates), big
fact joins shuffle on their join key with AQE handling skew, top-k uses
rank-pushdown-friendly window + filter (Spark's TakeOrderedAndProject for
global sort+limit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tank_spark.plans.registry import register
from tank_spark.sources.tables import load

# decimal-exact sum of a money/quantity column, surfaced as DOUBLE
_DEC = "decimal(18,4)"


def _dsum(col: Column | str, alias: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double").alias(alias)


def _dsum_sql(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,4))) AS DOUBLE) AS {alias}"


def _davg(col: Column | str, alias: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(_DEC)).cast("double") / F.count(F.lit(1))).alias(alias)


def _davg_sql(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS {alias}"


def _isum(col: str, alias: str, scale: int = 100) -> Column:
    """Integer-exact sum: round to fixed-point, sum as long, scale back.
    Order-independent like the decimal path but ~4x faster (plain int64
    adds in codegen vs BigDecimal); inputs must fit scale*sum < 2^63."""
    c = F.round(F.col(col) * scale, 0).cast("long")
    return (F.sum(c).cast("double") / F.lit(float(scale))).alias(alias)


def _isum_sql(col: str, alias: str, scale: int = 100) -> str:
    return (
        f"CAST(SUM(CAST(ROUND({col} * {scale}, 0) AS BIGINT)) AS DOUBLE)"
        f" / {scale}.0 AS {alias}"
    )


def _iavg(col: str, alias: str, scale: int = 100) -> Column:
    c = F.round(F.col(col) * scale, 0).cast("long")
    return (
        F.sum(c).cast("double") / F.lit(float(scale)) / F.count(F.lit(1))
    ).alias(alias)


def _iavg_sql(col: str, alias: str, scale: int = 100) -> str:
    return (
        f"CAST(SUM(CAST(ROUND({col} * {scale}, 0) AS BIGINT)) AS DOUBLE)"
        f" / {scale}.0 / COUNT(*) AS {alias}"
    )


def _rev() -> Column:
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice").cast(_DEC) * (F.lit(1) - F.col("l_discount")).cast(_DEC)


_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))"


# ------------------------------------------------------------------- Q1-ish

@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_isum_sql("l_quantity", "sum_qty")},
           {_isum_sql("l_extendedprice", "sum_base_price")},
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS DOUBLE)
             / 10000.0 AS sum_disc_price,
           {_iavg_sql("l_quantity", "avg_qty")},
           {_iavg_sql("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan-heavy groupBy with 6 aggregates, all as "
        "fixed-point integer sums (exact, order-independent, plain int64 "
        "adds in codegen). Scale: map-side-combine on a 6-value key.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    price_c = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc_c = F.round(F.col("l_discount") * 100, 0).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _isum("l_quantity", "sum_qty"),
            _isum("l_extendedprice", "sum_base_price"),
            (F.sum(price_c * (F.lit(100) - disc_c)).cast("double") / F.lit(10000.0))
            .alias("sum_disc_price"),
            _iavg("l_quantity", "avg_qty"),
            _iavg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-way join + agg + deterministic top-10 (unique "
        "tiebreak on l_orderkey). Scale: customer side broadcasts after its "
        "segment filter; orders<->lineitem shuffles on orderkey; global "
        "top-k executes as TakeOrderedAndProject (no full sort).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_nation_volume",
    f"""
    SELECT n_name, CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: 6-way star join. Scale: nation/region/supplier "
        "broadcast (dimension-sized); the customer-nation = supplier-nation "
        "constraint prunes early via the broadcast hash join. Region name "
        "is a REAL testdata value ('EUROPE' — non-empty at sf0.001 AND "
        "sf0.01); the original 'REGION_0' literal predates a testdata-"
        "generator change and made the r6 green row vacuous (0 rows both "
        "engines — VERDICT r6). The non-vacuity lint in "
        "tests/test_registry_hygiene.py now rejects that class.",
)
def q5_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp),
              (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: selective filter + global agg, served through "
        "the FILE-SKIPPING layer (operators/skipping.py — VERDICT r11 "
        "#4's standing consumer): lineitem is rewritten once per "
        "session value-clustered on l_shipdate with a per-file stats "
        "manifest, the year-range prunes the file list DRIVER-SIDE "
        "(an inclusive superset of the half-open predicate — pruning "
        "may only widen, the exact residual filter decides), and only "
        "the intersecting files are listed/opened; discount/quantity/"
        "shipdate still push to the pruned scan. At 100 TB this is the "
        "shipdate-range scan reading ~1/7 of the files instead of all "
        "of them — the add-file-stats cut a table format gives Q6. "
        "Oracle unchanged: skipping must never change results.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datetime import datetime

    from tank_spark.operators.skipping import clustered_layout, prune_files

    path, _ = clustered_layout(spark, sf_dir, "lineitem",
                               ("l_shipdate",), cluster_by="l_shipdate")
    files = prune_files(spark, path, "l_shipdate",
                        datetime(1997, 1, 1), datetime(1998, 1, 1))
    pred = (
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    li = (spark.read.option("basePath", path).parquet(*files).filter(pred)
          if files else spark.read.parquet(path).filter(pred).limit(0))
    return li.agg(
        F.sum(F.col("l_extendedprice").cast(_DEC) * F.col("l_discount").cast(_DEC))
        .cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


# ----------------------------------------------------------- windows / topk

@register(
    "topk_orders_per_priority",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    doc="Top-k per group via window + filter (deterministic tiebreak). "
        "Scale: single shuffle on the partition key; rank filter prunes "
        "before any downstream exchange.",
)
def topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_orderpriority", "o_orderkey", "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        ).filter(F.col("rn") <= 3)
    )


@register(
    "window_running_revenue",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total,
           LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
             AS prev_orderkey
    FROM orders WHERE o_custkey <= 50
    """,
    doc="Analytic windows: running sum + lag over a per-customer frame.",
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return orders.select(
        "o_custkey", "o_orderkey",
        F.sum(F.col("o_totalprice").cast(_DEC))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double").alias("running_total"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    )


# ------------------------------------------------- grouping sets / pivots

@register(
    "rollup_lineitem_status",
    f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           {_dsum_sql("l_quantity", "sum_qty")}
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP grouping sets (subtotals + grand total).",
)
def rollup_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), _dsum("l_quantity", "sum_qty")
    )


@register(
    "cube_order_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE grouping sets (all subtotal combinations).",
)
def cube_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "pivot_qty_by_status",
    f"""
    SELECT l_returnflag,
           {_dsum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity END", "O")},
           {_dsum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity END", "F")}
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Pivot: linestatus values become columns (Spark pivot API; the "
        "oracle is the equivalent conditional aggregation).",
)
def pivot_qty_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).cast("double"))
    )


# ------------------------------------------------ set ops / semi-anti joins

@register(
    "nations_customers_without_suppliers",
    """
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
    """,
    doc="Set difference (EXCEPT): nations with customers but no "
        "well-capitalized supplier (filter keeps the result non-empty).",
)
def nations_customers_without_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()
    s = (load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 5000)
         .select(F.col("s_nationkey").alias("nationkey")).distinct())
    return c.exceptAll(s).distinct()


@register(
    "nations_with_both",
    """
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
    doc="Set intersection (INTERSECT).",
)
def nations_with_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey")).distinct()
    return c.intersect(s)


@register(
    "customers_without_big_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
    doc="Anti join (NOT EXISTS -> left_anti). Scale: broadcast the "
        "aggregated key set when it fits; else shuffle-hash anti join.",
)
def customers_without_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "parts_with_cheap_supply",
    """
    SELECT p_partkey, p_name FROM part
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_partkey = p_partkey AND l_extendedprice < 2000)
    """,
    doc="Semi join (EXISTS -> left_semi).",
)
def parts_with_cheap_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") < 2000)
    return p.join(li, p.p_partkey == li.l_partkey, "left_semi").select("p_partkey", "p_name")


# ----------------------------------------------------- subqueries / distinct

@register(
    "orders_above_avg",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
      FROM orders)
    """,
    doc="Scalar subquery threshold (decimal-exact avg so both engines "
        "compute the identical cutoff).",
)
def orders_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    avg = o.agg(
        (F.sum(F.col("o_totalprice").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias("a")
    )
    return (
        o.join(F.broadcast(avg))
        .filter(F.col("o_totalprice") > F.col("a"))
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "distinct_parts_per_flag",
    """
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Multi distinct aggregation (expand + two-phase agg in Spark).",
)
def distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "union_all_key_space",
    """
    SELECT k, COUNT(*) AS n FROM (
      SELECT o_custkey AS k FROM orders
      UNION ALL
      SELECT c_custkey AS k FROM customer
    ) GROUP BY k HAVING COUNT(*) > 10
    """,
    doc="UNION ALL + HAVING.",
)
def union_all_key_space(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    return (
        o.unionAll(c).groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 10)
    )


@register(
    "sort_limit_parts",
    """
    SELECT p_partkey, p_name, p_retailprice FROM part
    ORDER BY p_retailprice DESC, p_partkey LIMIT 5
    """,
    doc="Global sort + limit (TakeOrderedAndProject; deterministic tiebreak).",
)
def sort_limit_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "part")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
        .limit(5)
    )

"""Advanced relational shapes: correlated subqueries, EXISTS-with-
aggregate, time-bucketed trends, exact quantiles — rounding out the
standard-SQL surface (SURVEY.md §2.11) beyond operators/relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tank_spark.operators.relational import _isum_sql, _isum
from tank_spark.plans.registry import register
from tank_spark.sources.tables import load


@register(
    "min_price_supplier_per_part",
    """
    SELECT l.l_partkey AS partkey, MIN(l.l_suppkey) AS suppkey, mn.min_price
    FROM lineitem l JOIN (
      SELECT l_partkey, MIN(l_extendedprice) AS min_price
      FROM lineitem GROUP BY l_partkey
    ) mn ON l.l_partkey = mn.l_partkey AND l.l_extendedprice = mn.min_price
    WHERE l.l_partkey <= 50
    GROUP BY l.l_partkey, mn.min_price
    """,
    doc="TPC-H Q2 shape: correlated min-per-group subquery (supplier "
        "offering the minimum price per part), decorrelated into a "
        "self-join on the grouped minimum — Catalyst's own rewrite, "
        "expressed explicitly. Deterministic via MIN(suppkey) tie-break.",
)
def min_price_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    mn = li.groupBy("l_partkey").agg(F.min("l_extendedprice").alias("min_price"))
    return (
        li.filter(F.col("l_partkey") <= 50)
        .join(mn, ["l_partkey"])
        .filter(F.col("l_extendedprice") == F.col("min_price"))
        .groupBy(F.col("l_partkey").alias("partkey"), "min_price")
        .agg(F.min("l_suppkey").alias("suppkey"))
        .select("partkey", "suppkey", "min_price")
    )


@register(
    "order_priority_late_ship",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS with a correlated date-arithmetic "
        "predicate -> left-semi join on orderkey.",
)
def order_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    sem = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(o.o_orderdate, 60)),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "monthly_revenue_trend",
    f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           {_isum_sql("o_totalprice", "revenue")},
           COUNT(*) AS n_orders
    FROM orders GROUP BY month
    """,
    doc="Time-bucketed trend: date_trunc month + fixed-point revenue sum.",
)
def monthly_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(_isum("o_totalprice", "revenue"), F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "small_quantity_parts",
    """
    WITH avg_q AS (
      SELECT l_partkey, CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE)
               / 100.0 / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l.l_partkey AS partkey, COUNT(*) AS n_small,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE)
             / 100.0 AS small_revenue
    FROM lineitem l JOIN avg_q a ON l.l_partkey = a.l_partkey
    WHERE l.l_quantity < 0.5 * a.avg_qty
    GROUP BY l.l_partkey
    """,
    doc="TPC-H Q17 shape: rows below a fraction of their group's average "
        "(correlated aggregate decorrelated into a grouped join). "
        "Fixed-point sums keep the threshold engine-exact.",
)
def small_quantity_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    qc = F.round(F.col("l_quantity") * 100, 0).cast("long")
    avg_q = li.groupBy("l_partkey").agg(
        (F.sum(qc).cast("double") / 100.0 / F.count(F.lit(1))).alias("avg_qty")
    )
    pc = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    return (
        li.join(avg_q, "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            (F.sum(pc).cast("double") / 100.0).alias("small_revenue"),
        )
    )


@register(
    "price_quantiles_by_flag",
    """
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5)  AS p50,
           quantile_cont(l_extendedprice, 0.9)  AS p90,
           MIN(l_extendedprice) AS min_p, MAX(l_extendedprice) AS max_p
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact continuous quantiles per group (Spark `percentile` and "
        "DuckDB `quantile_cont` share the linear-interpolation "
        "definition). At 100 TB the approximate form "
        "(percentile_approx/t-digest) replaces this; the exact form is "
        "the correctness anchor.",
)
def price_quantiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
        F.min("l_extendedprice").alias("min_p"),
        F.max("l_extendedprice").alias("max_p"),
    )


@register(
    "nation_trade_balance",
    f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           COUNT(*) AS n_items,
           {_isum_sql("l_extendedprice", "volume")}
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_nationkey < 16 AND sn.n_nationkey < 16
      AND cn.n_nationkey <> sn.n_nationkey
    GROUP BY cust_nation, supp_nation
    """,
    doc="TPC-H Q7 shape: bilateral volumes with the nation dimension "
        "joined twice under different roles (broadcast both).",
)
def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 16)
    cn = n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("ck"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("sk"))
        .filter(F.col("ck") != F.col("sk"))
        .groupBy("cust_nation", "supp_nation")
        .agg(F.count(F.lit(1)).alias("n_items"), _isum("l_extendedprice", "volume"))
    )


@register(
    "dense_rank_price_tiers",
    """
    SELECT p_brand, p_partkey, p_retailprice,
           DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS tier,
           NTILE(4) OVER (PARTITION BY p_brand
                          ORDER BY p_retailprice DESC, p_partkey) AS quartile
    FROM part WHERE p_size <= 10
    """,
    doc="More analytic windows: dense_rank + ntile (deterministic ntile "
        "via unique orderBy tiebreak).",
)
def dense_rank_price_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    w1 = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    w2 = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return p.select(
        "p_brand", "p_partkey", "p_retailprice",
        F.dense_rank().over(w1).cast("long").alias("tier"),
        F.ntile(4).over(w2).cast("long").alias("quartile"),
    )


@register(
    "top_returning_customers",
    f"""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS DOUBLE)
             / 10000.0 AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    doc="TPC-H Q10 shape: revenue lost to returned items per customer, "
        "top 20 (join + agg + deterministic top-k).",
)
def top_returning_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    pc = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    dc = F.round(F.col("l_discount") * 100, 0).cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg((F.sum(pc * (F.lit(100) - dc)).cast("double") / 10000.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "priority_by_ship_delay",
    """
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 'high' ELSE 'low' END AS prio_class,
           CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                THEN 'late' ELSE 'on_time' END AS ship_class,
           COUNT(*) AS n
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY prio_class, ship_class
    """,
    doc="TPC-H Q12 shape: shipping-delay classes x priority classes "
        "(CASE bucketing over a fact join).",
)
def priority_by_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    prio = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high"
    ).otherwise("low")
    late = F.when(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90), "late"
    ).otherwise("on_time")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(prio.alias("prio_class"), late.alias("ship_class"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "promo_revenue_share",
    """
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                         * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))
                    ELSE 0 END) AS DOUBLE)
           / SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS promo_share,
           COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: promo revenue share (conditional aggregate "
        "ratio; integer-exact numerator/denominator so the double division "
        "is engine-identical).",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    pc = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    dc = F.round(F.col("l_discount") * 100, 0).cast("long")
    rev = pc * (F.lit(100) - dc)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (F.sum(promo).cast("double") / F.sum(rev)).alias("promo_share"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "disjunctive_predicate_revenue",
    f"""
    SELECT COUNT(*) AS n, {_isum_sql("l_extendedprice", "revenue")}
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size <= 5)
       OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size <= 10)
       OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size <= 15)
    """,
    doc="TPC-H Q19 shape: disjunctive multi-attribute predicates over a "
        "fact-dimension join (pushes as a single OR filter).",
)
def disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(1, 11) & (F.col("p_size") <= 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(10, 20) & (F.col("p_size") <= 10))
        | ((F.col("p_brand") == "Brand#34") & F.col("l_quantity").between(20, 30) & (F.col("p_size") <= 15))
    )
    return j.filter(cond).agg(
        F.count(F.lit(1)).alias("n"), _isum("l_extendedprice", "revenue")
    )


@register(
    "array_agg_statuses",
    """
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
           len(list_sort(list(DISTINCT l_linestatus))) AS n_statuses,
           CASE WHEN list_contains(list(DISTINCT l_linestatus), 'O')
                THEN 1 ELSE 0 END AS has_open
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Complex-type aggregation: sorted distinct-value arrays per group "
        "(collect_set is unordered — sort_array makes it deterministic) "
        "plus array length/containment. The compared surface joins the "
        "array to a string (the driver's pandas canonicalizer can't hash "
        "list cells); the raw-array form is pytest-covered "
        "(array_agg_statuses_raw).",
)
def array_agg_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    arr = F.sort_array(F.collect_set("l_linestatus"))
    return li.groupBy("l_returnflag").agg(
        F.array_join(arr, ",").alias("statuses"),
        F.size(arr).cast("long").alias("n_statuses"),
        F.when(F.array_contains(arr, "O"), 1).otherwise(0).alias("has_open"),
    )


def array_agg_statuses_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-array variant (true complex-type output) — pytest-verified;
    the registered query compares the string-joined projection."""
    li = load(spark, sf_dir, "lineitem")
    arr = F.sort_array(F.collect_set("l_linestatus"))
    return li.groupBy("l_returnflag").agg(
        arr.alias("statuses"),
        F.size(arr).cast("long").alias("n_statuses"),
        F.when(F.array_contains(arr, "O"), 1).otherwise(0).alias("has_open"),
    )


@register(
    "grouping_sets_volume",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="Explicit GROUPING SETS (beyond ROLLUP/CUBE): chosen subtotal "
        "combinations only.",
)
def grouping_sets_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_li_gs")
    return spark.sql(
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
           FROM _li_gs
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"""
    )

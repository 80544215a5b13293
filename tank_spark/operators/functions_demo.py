"""Scalar string/math function surface (SURVEY.md §2.11 notes the
reference has no scalar libraries beyond its geo helpers — this engine
exposes Spark's, oracle-checked on the cross-engine-exact subset).

Exactness: string ops are byte-exact everywhere; math is restricted to
operations with exact IEEE semantics (abs/sign/mod/floor/ceil, powers of
two, integer round) — transcendentals (exp/ln/sin) are deliberately NOT
oracle-compared (libm last-ulp differences), mirroring how ``lat`` is
handled in sources/features.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tank_spark.plans.registry import register
from tank_spark.sources.tables import load


@register(
    "string_functions_demo",
    """
    SELECT p_partkey,
           UPPER(p_name) AS up,
           SUBSTRING(p_name, 1, 5) AS head5,
           CAST(LENGTH(p_name) AS BIGINT) AS n_chars,
           REPLACE(p_name, 'a', '@') AS repl,
           CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS has_a,
           CAST(levenshtein(p_brand, p_type) AS BIGINT) AS brand_type_dist,
           reverse(p_brand) AS rev_brand,
           concat_ws('|', p_brand, p_type) AS joined,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4
    FROM part WHERE p_partkey <= 100
    """,
    doc="String function surface: case, substring, replace, LIKE, "
        "levenshtein, reverse, concat_ws, lpad — byte-exact everywhere.",
)
def string_functions_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.substring("p_name", 1, 5).alias("head5"),
        F.length("p_name").cast("long").alias("n_chars"),
        F.replace(F.col("p_name"), F.lit("a"), F.lit("@")).alias("repl"),
        F.when(F.col("p_name").like("%a%"), 1).otherwise(0).alias("has_a"),
        F.levenshtein("p_brand", "p_type").cast("long").alias("brand_type_dist"),
        F.reverse("p_brand").alias("rev_brand"),
        F.concat_ws("|", "p_brand", "p_type").alias("joined"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size4"),
    )


@register(
    "math_functions_demo",
    """
    SELECT l_orderkey, l_linenumber,
           ABS(l_quantity - 25) AS dev,
           CAST(SIGN(l_quantity - 25) AS DOUBLE) AS sgn,
           CAST(l_quantity AS BIGINT) % 7 AS m7,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k,
           CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct,
           POWER(2.0, CAST(l_linenumber AS INT)) AS pow2,
           GREATEST(l_quantity, 25.0) AS hi,
           LEAST(l_quantity, 25.0) AS lo
    FROM lineitem WHERE l_orderkey <= 40
    """,
    doc="Math function surface restricted to exact IEEE operations "
        "(abs/sign/mod/floor/ceil/power-of-two/greatest/least).",
)
def math_functions_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 40)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("dev"),
        F.signum(F.col("l_quantity") - 25).alias("sgn"),
        (F.col("l_quantity").cast("long") % 7).alias("m7"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct"),
        F.pow(F.lit(2.0), F.col("l_linenumber").cast("int")).alias("pow2"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("hi"),
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("lo"),
    )

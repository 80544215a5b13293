"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real definitions live in the tank_spark package; this module is the
thin view the driver imports.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the tile query (tank's
    reason to exist) — pruned Morton-range scan + attribute filter."""
    from tank_spark.operators.tiles import tile_z9_range

    return tile_z9_range(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tank_spark.plans.registry import load_all

    return {name: q.spark for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    from tank_spark.plans.registry import load_all

    return {
        name: q.oracle for name, q in load_all().items() if q.oracle is not None
    }

"""Central query registry.

Every implemented operator registers here with a Spark builder
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, a DuckDB oracle
SQL string over the driver's pre-registered views (TESTDATA.md tables).
Non-SQL-expressible kernels (clip/MVT, iterative algos) register with
``oracle=None`` and get the driver's weaker rows-only check.

Column-name parity is part of the contract: the driver sorts columns by
name before value-hashing, so builders alias every computed column and the
oracle SQL uses the same aliases (driver contract in __spark_entry__.py).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    spark: SparkBuilder
    oracle: str | None  # DuckDB SQL, or None for rows-only checks
    doc: str = ""


QUERIES: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: register a Spark builder under ``name``."""

    def wrap(fn: SparkBuilder) -> SparkBuilder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QueryDef(name=name, spark=fn, oracle=oracle, doc=doc or fn.__doc__ or "")
        return fn

    return wrap


def load_all() -> dict[str, QueryDef]:
    """Import every operator module (side effect: registration) and return
    the registry. Import errors in one module must not take down the whole
    surface — they are re-raised only when that query is actually run.
    """
    import importlib

    modules = [
        "tank_spark.operators.tiles",
        "tank_spark.operators.heatmap",
        "tank_spark.operators.crud",
        "tank_spark.operators.ingest",
        "tank_spark.operators.relational",
        "tank_spark.operators.asof",
        "tank_spark.operators.advanced",
        "tank_spark.operators.functions_demo",
        "tank_spark.operators.stats",
        "tank_spark.operators.spatial_join",
        "tank_spark.llm.text",
        "tank_spark.llm.dedup",
        "tank_spark.llm.similarity",
        "tank_spark.llm.events",
        "tank_spark.llm.multimodal",
        "tank_spark.operators.mvt_tiles",
    ]
    for m in modules:
        try:
            importlib.import_module(m)
        except ModuleNotFoundError:
            pass  # module not built yet (incremental rounds)
    return QUERIES

"""Loaders for the driver's parquet tables (TESTDATA.md).

One place owns the path convention so every operator reads the same way:
``spark.read.parquet(f"{sf_dir}/{name}.parquet")``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# clustering key per table (the bucketing layout a 100 TB deployment would
# write): joins/groupBys on these keys then need no exchange, because the
# cached InMemoryTableScan reports its HashPartitioning to the planner.
_CLUSTER_KEY = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "part": "p_partkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

# The driver's parquet files are single-row-group (unsplittable): a raw
# scan is one task no matter the config. Materializing each table once per
# session — repartitioned on its cluster key — restores the parallelism and
# co-location a real multi-file/bucketed layout has. Results are identical;
# only the physical plan changes.
_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str,
         materialized: bool = True) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if not materialized:
        return raw
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if key not in _CACHE:
        n = max(spark.sparkContext.defaultParallelism // 2, 4)
        ck = _CLUSTER_KEY.get(name)
        df = raw.repartition(n, ck) if ck else raw.repartition(n)
        _CACHE[key] = df.persist()
    return _CACHE[key]


_EVENTS_CACHE: dict[tuple[str, str], DataFrame] = {}


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    reader rejects; read nanos as long (legacy conf, runtime-settable) and
    surface a microsecond ``ts`` timestamp — the same truncation DuckDB
    applies when casting ns->us, so oracle comparisons line up.

    Cached per session clustered on user_id (the sessionization key), for
    the same single-row-group reason as ``load``.
    """
    from pyspark.sql import functions as F

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _EVENTS_CACHE:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        n = max(spark.sparkContext.defaultParallelism // 2, 4)
        _EVENTS_CACHE[key] = df.repartition(n, "user_id").persist()
    return _EVENTS_CACHE[key]


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL-string API)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)

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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    reader rejects; read nanos as long (legacy conf, runtime-settable) and
    surface a microsecond ``ts`` timestamp — the same truncation DuckDB
    applies when casting ns->us, so oracle comparisons line up.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL-string API)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)

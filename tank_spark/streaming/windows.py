"""Streaming event-time operators: watermarked tumbling windows and
session windows — the streaming semantics the reference lacks entirely
(SURVEY.md §2.11: no watermarks / event-time / late-data handling).

Batch twins of these live in tank_spark/llm/events.py (oracle-checked);
these run the same logic as real Structured Streaming queries, tested by
replaying the events parquet through a stream (file source -> memory sink,
processAllAvailable) so watermark/window plumbing is exercised for real.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a bounded stream (ns timestamps -> us, like
    sources/tables.py:read_events)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the parquet file source wants a directory; glob-filter to the one file
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def windowed_counts_stream(events: DataFrame, window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling event-time window: late rows beyond the
    watermark are dropped, state is bounded — the scalable form of
    llm/events.py:tumbling_hourly_counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type", "n", "sum_value",
        )
    )


def session_windows_stream(events: DataFrame, gap: str = "30 minutes",
                           watermark: str = "2 hours") -> DataFrame:
    """Native session windows (gap-close semantics of
    llm/events.py:sessionize_events in streaming form; state bounded by
    the watermark)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id", "n_events",
        )
    )


def run_stream_to_memory(df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a bounded stream to completion into a memory sink; returns the
    finished query (results via ``spark.sql(f"SELECT * FROM {name}")``)."""
    q = (
        df.writeStream.format("memory").queryName(name)
        .outputMode(output_mode).trigger(availableNow=True).start()
    )
    q.processAllAvailable()
    return q

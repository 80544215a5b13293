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
    """events.parquet as a bounded stream (ts normalized to a us
    TIMESTAMP whatever the file's physical type, like
    sources/tables.py:read_events)."""
    from tank_spark.sources.tables import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the parquet file source wants a directory; glob-filter to the one file
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_event_ts(raw)


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


def dedup_events_stream(events: DataFrame,
                        watermark: str = "2 hours") -> DataFrame:
    """Exactly-once projection of an at-least-once event feed:
    watermark-bounded streaming dedup on the event key. State holds one
    entry per key only within the watermark horizon — the unbounded-state
    trap of plain ``dropDuplicates`` on a stream is avoided. Batch twin
    (oracle-checked): llm/events.py:dedup_event_stream_replay."""
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )


# ------------------------------------------------ oracle-checked batch twins
#
# F.window / F.session_window are plain Catalyst expressions: the SAME
# functions above run as batch plans when fed a batch DataFrame (the
# watermark is a no-op in batch). Registering the batch runs with DuckDB
# oracles turns the streaming operators' pytest-only coverage into hard
# driver rows — the logic checked is literally the streaming code path.

from tank_spark.plans.registry import register  # noqa: E402
from tank_spark.sources.tables import read_events  # noqa: E402

_GAP_US = 30 * 60 * 1_000_000  # 30 min, matches session_windows_stream
_HOUR_US = 3_600_000_000


@register(
    "streaming_windowed_counts",
    f"""
    WITH e AS (
      SELECT event_type, value,
             (epoch_us(CAST(ts AS TIMESTAMP)) // {_HOUR_US}) * {_HOUR_US} AS w0
      FROM events
    )
    SELECT w0 AS window_start_us, w0 + {_HOUR_US} AS window_end_us,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM e GROUP BY w0, event_type
    """,
    doc="The watermarked tumbling-window STREAMING aggregation run as a "
        "batch plan (F.window is the same expression in both modes) — "
        "oracle-checks the exact code the stream executes.",
)
def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = windowed_counts_stream(read_events(spark, sf_dir))
    return out.select(
        F.unix_micros("window_start").alias("window_start_us"),
        F.unix_micros("window_end").alias("window_end_us"),
        "event_type", "n", "sum_value",
    )


@register(
    "streaming_session_windows",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events
    ),
    flagged AS (
      -- session_window merges while diff < gap: an event exactly gap
      -- after the last one starts a NEW session (window ends are open)
      SELECT user_id, t,
             CASE WHEN LAG(t) OVER w IS NULL
                   OR t - LAG(t) OVER w >= {_GAP_US} THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)
    ),
    sess AS (
      SELECT user_id, t,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id, MIN(t) AS session_start_us,
           MAX(t) + {_GAP_US} AS session_end_us, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
    doc="The native session-window STREAMING aggregation run as a batch "
        "plan; oracle reconstructs gap-close semantics (start = first "
        "event, end = last event + gap, split at diff >= gap) with "
        "lag + cumulative-flag SQL.",
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = session_windows_stream(read_events(spark, sf_dir))
    return out.select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "n_events",
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

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


# --------------------------------------------- watermark late-data drop twin
#
# The one streaming semantic the batch twins above do NOT reach: the
# watermark actually DROPPING late rows (in batch mode withWatermark is a
# no-op, so streaming_windowed_counts oracle-checks the window arithmetic
# but never the eviction rule). This twin replays the event feed in a
# synthesized arrival order with genuine late data and applies Spark's
# append-mode rule explicitly — a row is dropped iff its window END is <=
# the watermark in effect for its micro-batch, where the watermark of
# batch k is max(event time over batches j < k) - delay (the engine
# updates the watermark between batches, never within one).
#
# events.parquet is ts-ordered by construction (event_id order == ts
# order: measured 0 out-of-order rows), so arrival = event_id would make
# the check vacuous. A deterministic 5% of events (salted-md5 uniform,
# the mixing.py idiom) arrive LATE_DEFER_IDS arrival slots late:
# arrival_key = event_id + defer. Micro-batches are fixed arrival-slot
# ranges (arrival_key div REPLAY_BATCH) — no global sort, no row_number:
# batch assignment is map-only, the per-batch max-ts table is batch-
# cardinality-bounded (n/250 rows), the running-max window runs over
# THAT tiny table only, and the watermark joins back in broadcast. At
# 100 TB the same plan holds: the only non-mapside state is one row per
# micro-batch. Non-vacuous by measurement: 38/1000 dropped at sf0.001,
# 458/10000 at sf0.01, 185/100000 at sf0.1.
#
# tests/test_streaming.py drives the SAME batches through the real
# windowed_counts_stream (one file per micro-batch, maxFilesPerTrigger=1)
# and checks the engine's append output agrees with this replay rule.

LATE_SALT = "late:"
LATE_RATE = 0.05
LATE_DEFER_IDS = 600
REPLAY_BATCH = 250
WM_DELAY = "4 hours"
WM_DELAY_US = 4 * _HOUR_US


@register(
    "watermark_late_drop",
    f"""
    WITH e AS (
      SELECT event_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t,
             CAST(round(value * 1000000.0, 0) AS BIGINT) AS vm,
             event_id + CASE WHEN ('0x' || substr(md5('{LATE_SALT}' ||
                 CAST(event_id AS VARCHAR)), 1, 8))::UBIGINT / 4294967296.0
                 < {LATE_RATE} THEN {LATE_DEFER_IDS} ELSE 0 END AS ak
      FROM events
    ),
    b AS (SELECT *, ak // {REPLAY_BATCH} AS batch_id FROM e),
    bm AS (SELECT batch_id, MAX(t) AS bmax FROM b GROUP BY batch_id),
    wm AS (SELECT batch_id,
                  MAX(bmax) OVER (ORDER BY batch_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  - {WM_DELAY_US} AS wm_us
           FROM bm),
    j AS (
      SELECT b.event_type, b.vm,
             (b.t // {_HOUR_US}) * {_HOUR_US} AS w0,
             CASE WHEN (b.t // {_HOUR_US}) * {_HOUR_US} + {_HOUR_US}
                       <= wm.wm_us THEN 1 ELSE 0 END AS dropped
      FROM b JOIN wm USING (batch_id)
    )
    SELECT w0 AS window_start_us, event_type,
           COUNT(*) FILTER (WHERE dropped = 0) AS n_kept,
           COUNT(*) FILTER (WHERE dropped = 1) AS n_late_dropped,
           CAST(COALESCE(SUM(vm) FILTER (WHERE dropped = 0), 0) AS BIGINT)
             AS sum_value_micro_kept
    FROM j GROUP BY w0, event_type
    """,
    doc="Watermark late-data drop, replayed as a batch plan: events "
        "re-ordered into a deterministic arrival stream (5% salted-md5-"
        "selected events deferred 600 arrival slots), chunked into fixed "
        "250-slot micro-batches; batch k's watermark = max prior-batch "
        "event time - 4h, and a row is dropped iff its hourly window end "
        "<= that watermark — Spark's append-mode eviction rule applied "
        "explicitly. Output: per (window, event_type) kept/dropped "
        "counts + kept value sum. Scale: batch assignment is map-only "
        "(no global sort), the running-max window covers only the "
        "one-row-per-batch table, watermarks broadcast back.",
)
def watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir)
    h8 = F.substring(
        F.md5(F.concat(F.lit(LATE_SALT), F.col("event_id").cast("string"))),
        1, 8)
    u = F.conv(h8, 16, 10).cast("bigint") / F.lit(4294967296.0)
    ak = F.col("event_id") + F.when(
        u < F.lit(LATE_RATE), F.lit(LATE_DEFER_IDS)).otherwise(F.lit(0))
    e = ev.select(
        "event_type",
        F.unix_micros("ts").alias("t"),
        F.round(F.col("value") * 1000000.0, 0).cast("long").alias("vm"),
        ak.alias("ak"),
    ).withColumn("batch_id", F.expr(f"ak div {REPLAY_BATCH}"))
    bm = e.groupBy("batch_id").agg(F.max("t").alias("bmax"))
    w = Window.orderBy("batch_id").rowsBetween(Window.unboundedPreceding, -1)
    wm = bm.select(
        "batch_id",
        (F.max("bmax").over(w) - F.lit(WM_DELAY_US)).alias("wm_us"),
    )
    j = e.join(F.broadcast(wm), "batch_id")
    w0 = F.expr(f"(t div {_HOUR_US}) * {_HOUR_US}")
    dropped = (
        F.col("wm_us").isNotNull()
        & ((w0 + F.lit(_HOUR_US)) <= F.col("wm_us"))
    ).cast("int")
    return (
        j.select("event_type", "vm", w0.alias("w0"), dropped.alias("dropped"))
        .groupBy("w0", "event_type")
        .agg(
            F.count(F.when(F.col("dropped") == 0, 1)).alias("n_kept"),
            F.count(F.when(F.col("dropped") == 1, 1)).alias("n_late_dropped"),
            F.coalesce(
                F.sum(F.when(F.col("dropped") == 0, F.col("vm"))), F.lit(0)
            ).cast("long").alias("sum_value_micro_kept"),
        )
        .select(
            F.col("w0").alias("window_start_us"), "event_type",
            "n_kept", "n_late_dropped", "sum_value_micro_kept",
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

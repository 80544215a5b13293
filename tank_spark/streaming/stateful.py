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

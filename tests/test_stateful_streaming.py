"""Custom stateful operator test: state must accumulate ACROSS
micro-batches (two files, maxFilesPerTrigger=1 -> two batches), and the
final running totals must equal the batch groupBy."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_running_spend_accumulates_across_batches(spark, tmp_path):
    from tank_spark.sources.tables import read_events
    from tank_spark.streaming.stateful import running_spend_stream
    from tank_spark.util import ensure_workers_have_package

    ensure_workers_have_package(spark)
    ev = read_events(spark, SF_DIR).select("event_id", "user_id", "value")
    # two slice files -> two micro-batches through the same query
    drop = tmp_path / "drop"
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(str(drop / "a"))
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(str(drop / "b"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(drop))
    )
    out = running_spend_stream(stream)
    q = (
        out.writeStream.format("memory").queryName("spend_out")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.processAllAvailable()
    q.stop()

    res = spark.sql("SELECT * FROM spend_out").collect()
    # update mode: one row per (user, batch) touched -> the LAST row per
    # user is the final state; users in both slices appear twice
    n_batches_per_user: dict = {}
    final: dict = {}
    for r in res:
        n_batches_per_user[r["user_id"]] = n_batches_per_user.get(r["user_id"], 0) + 1
        final[r["user_id"]] = r  # memory sink appends in batch order
    assert max(n_batches_per_user.values()) == 2  # state carried across batches

    want = {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(final) == set(want)
    for uid, w in want.items():
        got = final[uid]
        assert got["n_events"] == w["n"]
        assert math.isclose(got["total_value"], w["total"], rel_tol=1e-9)
        assert got["alerts"] == int(got["total_value"] // 500.0)


def test_stream_spend_post_state_crafted_alert_crossing(spark, tmp_path):
    """The registered post-state query on a crafted events table: user 1
    crosses the 500-unit alert threshold only CUMULATIVELY (300 in the
    even batch + 300 in the odd batch), so alerts=1 proves the state
    carried across micro-batches; user 2 lives in one batch only."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tank_spark.streaming.stateful import stream_spend_post_state

    rows = [
        # (event_id, user_id, value): parity splits the batches
        (0, 1, 300.0),   # batch even: user 1 at 300 (< 500, no alert)
        (1, 1, 300.0),   # batch odd: cumulative 600 -> alert fires
        (2, 2, 120.5),   # user 2: even batch only, floor -> 120
        (4, 2, 100.0),
    ]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([0] * len(rows), pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array(["click"] * len(rows)),
        "value": pa.array([r[2] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    got = {r.user_id: (r.n_events, r.total_units, r.alerts, r.n_emissions)
           for r in stream_spend_post_state(spark, str(tmp_path)).collect()}
    assert got == {
        1: (2, 600, 1, 2),   # 2 emissions = seen in both micro-batches
        2: (2, 220, 0, 1),   # even-batch only, one emission
    }

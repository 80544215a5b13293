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

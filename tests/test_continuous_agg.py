"""Continuous aggregate: after N micro-batches the rollup table must
equal the batch groupBy over everything ingested so far — including
buckets UPDATED across batches (the merge path, not just appends)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_rollup_matches_batch_after_incremental_merges(spark, tmp_path):
    from tank_spark.sources.tables import read_events
    from tank_spark.streaming.continuous_agg import (
        BUCKET_US, read_rollup, start_rollup_stream,
    )

    ev = read_events(spark, SF_DIR).select("event_id", "event_type", "ts", "value")
    drop = tmp_path / "drop"
    # split by event_id parity: both slices hit the SAME hour buckets, so
    # the second batch exercises the merge-into-existing-bucket path
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(str(drop / "a"))
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(str(drop / "b"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(drop))
    )
    q = start_rollup_stream(spark, stream, str(tmp_path / "rollup"),
                            str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = {
        (r["bucket_us"], r["event_type"]): (r["n"], r["sum_cents"])
        for r in read_rollup(spark, str(tmp_path / "rollup")).collect()
    }
    want = {
        (r["bucket_us"], r["event_type"]): (r["n"], r["sum_cents"])
        for r in ev.groupBy(
            (F.unix_micros("ts") - (F.unix_micros("ts") % BUCKET_US)).alias("bucket_us"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("sum_cents"),
        ).collect()
    }
    assert got == want
    # merge path really ran: at least one bucket has rows from both batches
    assert any(n > 1 for n, _ in got.values())

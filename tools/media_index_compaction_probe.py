#!/usr/bin/env python
"""VERDICT r10 #4: the streaming media index grows by per-epoch
directory appends — at crawl cadence that's a small-files problem and
the banded probe join loses co-location. Quantify it and show
compact_media_index fixes it: build a base index from the sf media
corpus, append N synthetic survivor epochs, then time the SAME
disposition probe against (a) the fragmented N-epoch layout and
(b) the compacted single-generation layout (bands partitioned by
(modality, band_val)).

Prints one RESULT line per (n_epochs, layout): median probe seconds
over RUNS fresh plan builds, plus file counts.

Usage: python tools/media_index_compaction_probe.py [SF_DIR] [EPOCHS...]
"""
from __future__ import annotations

import os
import shutil
import sys
import time


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    epoch_counts = [int(a) for a in sys.argv[2:]] or [10, 40]
    runs = 3

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("media_index_compaction_probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tank_spark.llm.media_inc import _base_media
    from tank_spark.streaming.media_dedup_stream import (
        _write_index_epoch,
        compact_media_index,
        disposition_media_batch,
        index_epoch_count,
        read_media_index,
        write_media_index,
    )

    base = _base_media(spark, src).localCheckpoint(eager=True)
    n_base = base.count()
    print(f"base media corpus: {n_base} rows from {src}")

    # a fixed probe batch: 200 fresh payloads (band probes miss, exact
    # probes miss — the worst case reads the whole band relation)
    probe = base.limit(200).select(
        (F.col("cid") + 10_000_000).alias("cid"), "modality",
        F.md5(F.hex("payload")).cast("binary").alias("_x"))
    probe = probe.select(
        "cid", "modality",
        F.unhex(F.concat(F.md5(F.hex("_x")), F.md5(F.concat(F.hex("_x"),
                F.lit(":z"))))).alias("payload")).localCheckpoint(eager=True)

    def count_files(d: str) -> int:
        total = 0
        for root, _, files in os.walk(d):
            total += sum(1 for f in files if f.endswith(".parquet"))
        return total

    def timed_probe(index_dir: str) -> list[float]:
        ts = []
        for _ in range(runs + 1):  # first is warm-up
            t0 = time.perf_counter()
            ifp, ib = read_media_index(spark, index_dir)
            disposition_media_batch(spark, probe, ifp, ib) \
                .write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        ts = sorted(ts[1:])
        return ts

    for n_epochs in epoch_counts:
        index_dir = f"/tmp/media_idx_probe_{n_epochs}"
        shutil.rmtree(index_dir, ignore_errors=True)
        write_media_index(spark, base, index_dir)
        # each epoch appends a slice of fresh synthetic survivors
        # (~n_base/50 rows per epoch — a realistic crawl increment)
        per = max(n_base // 50, 10)
        for e in range(n_epochs):
            inc = base.filter(F.col("cid") % n_epochs == e).limit(per)
            inc = inc.select(
                (F.col("cid") + (e + 1) * 1_000_000).alias("cid"),
                "modality",
                F.unhex(F.concat(
                    F.md5(F.concat(F.hex("payload"), F.lit(f":e{e}"))),
                    F.md5(F.concat(F.hex("payload"), F.lit(f":e{e}b")))))
                .alias("payload"))
            _write_index_epoch(spark, inc, index_dir, e)
        n_gen = index_epoch_count(index_dir)
        nf = count_files(os.path.join(index_dir, "bands"))
        ts = timed_probe(index_dir)
        print(f"RESULT epochs={n_epochs} layout=fragmented gens={n_gen} "
              f"band_files={nf} runs={[round(t, 3) for t in ts]} "
              f"median={ts[len(ts) // 2]:.3f}")
        compact_media_index(spark, index_dir)
        n_gen = index_epoch_count(index_dir)
        nf = count_files(os.path.join(index_dir, "bands"))
        ts = timed_probe(index_dir)
        print(f"RESULT epochs={n_epochs} layout=compacted gens={n_gen} "
              f"band_files={nf} runs={[round(t, 3) for t in ts]} "
              f"median={ts[len(ts) // 2]:.3f}")
        shutil.rmtree(index_dir, ignore_errors=True)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()

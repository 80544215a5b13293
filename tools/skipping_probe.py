#!/usr/bin/env python
"""Measure the file-level data-skipping win (operators/skipping.py):
cluster a large table into N files, build the manifest, then time a
~1%-selectivity range scan three ways — full filter over the table,
manifest-pruned scan, and the pruned scan's file count vs total.

The point at 100 TB is the FILE LIST: a pruned scan lists/opens k of N
files instead of all N (metadata + IO), on top of whatever row-group
pruning parquet already does inside opened files.

Usage: python tools/skipping_probe.py [SRC_PARQUET] [N_FILES] [RUNS]
Defaults: /tmp/scale10/lineitem.parquet (make_scale10 first), 64, 3.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10/lineitem.parquet"
n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
runs_n = int(sys.argv[3]) if len(sys.argv) > 3 else 3

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.driver.memory", "48g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from tank_spark.operators.skipping import (  # noqa: E402
    build_manifest,
    prune_files,
    skipping_scan,
    write_clustered,
)

col = "l_orderkey"
df = spark.read.parquet(src)
n = df.count()
mx = df.agg(F.max(col)).first()[0]
lo, hi = int(mx * 0.495), int(mx * 0.505)  # ~1% of the key space
print(f"loadavg={os.getloadavg()[0]:.1f} rows={n}")


def timed(build) -> float:
    def once() -> float:
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    once()
    runs = sorted(once() for _ in range(runs_n))
    return runs[len(runs) // 2]


# the win grows with file count (full scan pays listing + a footer
# read per file; the pruned path is O(selected)) — measure both a
# modest and a many-files layout
for nf in (n_files, n_files * 8):
    path = f"/tmp/skipping_probe_table_{nf}"
    write_clustered(df, path, col, nf)
    t0 = time.perf_counter()
    build_manifest(spark, path, [col])
    t_manifest = time.perf_counter() - t0
    full = timed(lambda: spark.read.parquet(path)
                 .filter(F.col(col).between(lo, hi)))
    pruned = timed(lambda: skipping_scan(spark, path, col, lo, hi))
    kept = len(prune_files(spark, path, col, lo, hi))
    n_match = skipping_scan(spark, path, col, lo, hi).count()
    assert n_match == (spark.read.parquet(path)
                       .filter(F.col(col).between(lo, hi)).count())
    print(f"RESULT files={nf} manifest_build={t_manifest:.2f}s "
          f"full_scan={full:.3f}s pruned_scan={pruned:.3f}s "
          f"files_read={kept}/{nf} rows_matched={n_match} "
          f"speedup={full / pruned:.1f}x")


def zorder_section() -> None:
    """2-D clustering win: a range on the SECOND column (not the 1-D
    sort key) — 1-D layout prunes nothing there; Z-order keeps a
    ~sqrt-fraction rectangle of files."""
    from tank_spark.operators.skipping import write_clustered_zorder

    a, b = "l_orderkey", "l_partkey"
    bmx = df.agg(F.max(b)).first()[0]
    blo, bhi = int(bmx * 0.495), int(bmx * 0.505)
    for label, writer in (
        ("1d", lambda p: write_clustered(df, p, a, 256)),
        ("zorder", lambda p: write_clustered_zorder(df, p, (a, b), 256)),
    ):
        path = f"/tmp/skipping_probe_{label}"
        writer(path)
        build_manifest(spark, path, [a, b])
        fullb = timed(lambda: spark.read.parquet(path)
                      .filter(F.col(b).between(blo, bhi)))
        prunedb = timed(lambda: skipping_scan(spark, path, b, blo, bhi))
        kept = len(prune_files(spark, path, b, blo, bhi))
        nm = skipping_scan(spark, path, b, blo, bhi).count()
        assert nm == (spark.read.parquet(path)
                      .filter(F.col(b).between(blo, bhi)).count())
        print(f"RESULT layout={label} col2_range full={fullb:.3f}s "
              f"pruned={prunedb:.3f}s files_read={kept}/256 "
              f"rows={nm} speedup={fullb / prunedb:.1f}x")


zorder_section()
spark.stop()

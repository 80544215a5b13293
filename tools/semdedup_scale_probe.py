#!/usr/bin/env python
"""Measure how incremental semantic dedup scales with corpus size, and
how the quantizer's list count (nlist) bends the curve.

At a FIXED nlist the routed probe's candidate count is
|batch| * (corpus / nlist) * nprobe — both factors grow with the
corpus, so cost grows ~quadratically in the scale factor K. Scaling
nlist with the corpus (the standing quantizer arc: flat literal to
~10^3 lists, frozen two-level to ~10^5) holds list size constant and
restores ~linear growth. This probe measures exactly that: the probe
chain at sf0.1 and at a K-times directory (tools/make_scale10.py), for
the frozen flat k=8 quantizer AND the frozen two-level k=64 one —
k=64's lists are 8x smaller, so at K=10 its candidate count matches
the flat quantizer's at ~K=3.5.

Timed unit: semdedup_inc._incremental_core to the noop sink (the full
derived-corpus disposition — scored projections, routed probe,
in-batch probe, assembly). Median of RUNS warm runs after one warm-up.

Usage: python tools/semdedup_scale_probe.py [SCALED_DIR] [RUNS]
(generate the scaled dir first: python tools/make_scale10.py 10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

scaled_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10"
runs_n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
base_dir = "/root/testdata/sf0.1"

from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.driver.memory", "48g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from tank_spark.llm.semdedup_inc import _incremental_core  # noqa: E402


def timed(sf_dir: str, quantizer: str) -> float:
    def once() -> float:
        t0 = time.perf_counter()
        _incremental_core(spark, sf_dir, quantizer) \
            .write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    once()  # warm-up (codegen, file listing, table cache)
    runs = sorted(once() for _ in range(runs_n))
    return runs[len(runs) // 2]


print(f"loadavg={os.getloadavg()[0]:.1f}")
results: dict[tuple[str, str], float] = {}
for q in ("frozen", "twolevel"):
    for label, d in (("1x", base_dir), ("Kx", scaled_dir)):
        if not os.path.isdir(d):
            print(f"SKIP {label} ({d} missing)")
            continue
        med = timed(d, q)
        results[(q, label)] = med
        print(f"RESULT quantizer={q} dir={label} median={med:.2f}s")
for q in ("frozen", "twolevel"):
    if (q, "1x") in results and (q, "Kx") in results:
        r = results[(q, "Kx")] / results[(q, "1x")]
        print(f"RATIO quantizer={q} Kx/1x={r:.1f}")
print(f"loadavg={os.getloadavg()[0]:.1f}")
spark.stop()

#!/usr/bin/env python
"""Isolate the LSH skew-cap overhead (VERDICT r5 #5).

Times three candidate-generation plans at sf0.1 on an idle machine:
  uncapped      — band self-join, no guard
  cap_antijoin  — current default: bucket-count agg -> broadcast anti-join
  cap_window    — candidate: count().over(Window by band keys) -> filter;
                  the window shuffles bands on the SAME key the self-join
                  needs, so the exchange is reusable and the cap costs one
                  window pass instead of a second aggregate subtree.

Run: python tools/cap_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tank_spark.llm import dedup as D


def _cands_window(sig: DataFrame, cap: int) -> DataFrame:
    bands = sig.select("cid", F.posexplode("bands").alias("band_idx", "band_val"))
    w = Window.partitionBy("band_idx", "band_val")
    kept = (
        bands.withColumn("n", F.count(F.lit(1)).over(w))
        .filter(F.col("n") <= cap)
        .select("cid", "band_idx", "band_val")
    )
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.band_val") == F.col("b.band_val"))
               & (F.col("a.cid") < F.col("b.cid")))
        .select(F.col("a.cid").alias("cid_a"), F.col("b.cid").alias("cid_b"))
        .distinct()
    )


def _pairs(sig: DataFrame, cand: DataFrame, k: int) -> DataFrame:
    sa = sig.select(F.col("cid").alias("cid_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("cid").alias("cid_b"), F.col("sig").alias("sig_b"))
    agree = F.zip_with("sig_a", "sig_b", lambda x, y: x == y)
    n_match = F.size(F.filter(agree, lambda v: v))
    return (
        cand.join(sa, "cid_a").join(sb, "cid_b")
        .withColumn("n_match", n_match)
        .filter(F.col("n_match") >= k // 2)
        .select("cid_a", "cid_b",
                (F.col("n_match").cast("double") / k).alias("est_jaccard"))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("cap_probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for k, band_w, lanes in ((12, 2, 1), (128, 4, 4)):
        sig = D._sig_array(spark, sf_dir, k, lanes, band_w)
        plans = {
            "uncapped": lambda: _pairs(sig, D._lsh_candidates(sig, None), k),
            "cap_antijoin": lambda: _pairs(
                sig, D._lsh_candidates(sig, D.LSH_BUCKET_CAP), k),
            "cap_window": lambda: _pairs(
                sig, _cands_window(sig, D.LSH_BUCKET_CAP), k),
        }
        for name, build in plans.items():
            build().write.mode("overwrite").format("noop").save()  # warm
            runs = []
            for _ in range(5):
                t0 = time.perf_counter()
                build().write.mode("overwrite").format("noop").save()
                runs.append(time.perf_counter() - t0)
            runs.sort()
            print(f"K={k:3d} {name:12s} median={runs[2]:.3f}s "
                  f"spread={runs[0]:.3f}-{runs[-1]:.3f}")
        # value parity: window cap must emit the identical pair set
        a = plans["cap_antijoin"]().collect()
        b = plans["cap_window"]().collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b)), \
            f"K={k}: window-cap pair set differs from anti-join cap"
        print(f"K={k:3d} parity OK ({len(a)} pairs)")
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""VERDICT r9 #5: is the map-only literal-centroid IVF quantizer honest
at a PRODUCTION nlist, or an artifact of N_CENTROIDS=8?

Builds a K-times embeddings corpus (vec_id-shifted copies of the sf
embeddings table, written to /tmp so similarity.load() sees a normal sf
dir), then times coarse assignment THREE ways at each nlist:

  literal  — the registered posture: _centroid_score_structs(nlist) as
             one transform lambda over an F.expr literal array;
             array_min argmin is a map-only projection.
  join     — the alternative a naive port would use: broadcast-join the
             nlist centroid rows against every vector, min_by argmin
             (one nlist-fold row blowup + a corpus-wide aggregate).
  build    — driver-side Column+plan construction cost of the literal
             form alone (fresh expr, no execution), the per-build
             overhead a long-lived server pays once per data version.

Prints one line per (nlist, form): median of N timed noop writes.

Usage: python tools/ivf_nlist_probe.py [K] [SF_DIR] [NLISTS...]
"""
from __future__ import annotations

import sys
import time


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    nlists = [int(a) for a in sys.argv[3:]] or [8, 64, 256]
    out_dir = f"/tmp/ivf_nlist_emb{k}x"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ivf_nlist_probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    e = spark.read.parquet(f"{src}/embeddings.parquet")
    n = e.count()
    scaled = None
    for i in range(k):
        c = e.select((F.col("vec_id") + i * n).alias("vec_id"),
                     "embedding", "label")
        scaled = c if scaled is None else scaled.unionByName(c)
    scaled.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    big = spark.read.parquet(f"{out_dir}/embeddings.parquet")
    print(f"corpus: {big.count()} vectors ({k}x {src})")

    from tank_spark.llm import similarity as sim

    def timed(tag, nlist, mk, runs=3):
        mk().write.format("noop").mode("overwrite").save()  # warm
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"RESULT nlist={nlist} form={tag} "
              f"runs={[round(t, 3) for t in ts]} median={ts[len(ts)//2]:.3f}")

    for nlist in nlists:
        # GENUINE fresh-build cost (review r10: the first cut timed the
        # already-memoized Column): drop every cache entry for this key,
        # then time collect + expr assembly + one analyze end-to-end —
        # the once-per-data-version cost a long-lived server pays
        for key in [k for k in sim._CENTROID_CACHE
                    if k[-2:] == (out_dir, nlist)]:
            del sim._CENTROID_CACHE[key]
        t0 = time.perf_counter()
        arr = sim._centroid_score_structs(spark, out_dir, nlist)
        spark.createDataFrame([], "embedding array<float>") \
            .select(F.array_min(arr)["centroid_id"]).schema  # force analyze
        build_s = time.perf_counter() - t0
        print(f"RESULT nlist={nlist} form=build "
              f"collect+expr+analyze={build_s:.3f}s")

        timed("literal", nlist, lambda: big.select(
            "vec_id", F.array_min(arr)["centroid_id"].alias("centroid_id")))

        cents = big.filter(F.col("vec_id") < nlist).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("c_emb"))
        dot = sim._dot_cols(F.col("embedding"), F.col("c_emb"))
        n_c = sim._dot_cols(F.col("c_emb"), F.col("c_emb"))
        score = -2 * dot + n_c
        timed("join", nlist, lambda: (
            big.join(F.broadcast(cents))
            .select("vec_id", "centroid_id", score.alias("score"))
            .groupBy("vec_id")
            .agg(F.min_by("centroid_id",
                          F.struct("score", "centroid_id"))
                 .alias("centroid_id"))))

        # plan audit of the literal form: must stay exchange-free
        plan = (big.select(
            "vec_id", F.array_min(arr)["centroid_id"].alias("centroid_id"))
            ._jdf.queryExecution().executedPlan().toString())
        has_ex = "Exchange" in plan
        print(f"RESULT nlist={nlist} literal_plan_exchange_free={not has_ex}")


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()

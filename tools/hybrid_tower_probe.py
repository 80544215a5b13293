#!/usr/bin/env python
"""How the hybrid entry's two SEMANTIC towers scale with corpus size —
the measured version of hybrid_search_rrf_ivf's scale claim (the same
discipline as tools/hyperplane_scale_probe.py for the width law).

The claim: the brute tower RANKS the whole corpus per query (candidates
= 4 * (N - 1)), the IVF tower ranks only the probed inverted lists
(candidates ~ 4 * N * nprobe / nlist) — so the ranking stage's input is
cut ~nlist/nprobe-fold at ANY corpus size, which is what survives the
1000x from the test SF to 100 TB. Wall time here includes the INLINE
quantizer assignment pass (O(N) map in both this harness and the
registered entry); production amortizes assignment into the index
build, so the honest wall story is "assignment-dominated at toy sizes,
ranking-dominated at scale" — this probe prints both the candidate
counts (the scale dial) and the tower walls (the toy-size reality).

Usage: PYTHONPATH=/root/repo python tools/hybrid_tower_probe.py \
        [SCALED_DIR] [RUNS]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

scaled_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10"
runs_n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
base_dir = "/root/testdata/sf0.1"

from pyspark.sql import SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.driver.memory", "48g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from tank_spark.llm.search import HYBRID_QVECS, HYBRID_TOPK  # noqa: E402
from tank_spark.llm.similarity import (_dot_cols, _frozen_score_structs,  # noqa: E402
                                       _probe_core)
from tank_spark.sources.tables import load  # noqa: E402

QVIDS = tuple(v for _, v in HYBRID_QVECS)


def brute_tower(sf_dir: str):
    """The brute entry's semantic tower, verbatim shape."""
    e = load(spark, sf_dir, "embeddings")
    qv = spark.createDataFrame(list(HYBRID_QVECS), "qid int, qvid long")
    qe = (e.join(F.broadcast(qv), e.vec_id == qv.qvid)
          .select("qid", "qvid", F.col("embedding").alias("q_emb")))
    cos = (_dot_cols(F.col("q_emb"), F.col("embedding"))
           / (F.sqrt(_dot_cols(F.col("q_emb"), F.col("q_emb")))
              * F.sqrt(_dot_cols(F.col("embedding"), F.col("embedding")))))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (e.join(F.broadcast(qe), e.vec_id != qe.qvid)
            .select("qid", "vec_id", cos.alias("cosine"))
            .withColumn("srank", F.row_number().over(w))
            .filter(F.col("srank") <= HYBRID_TOPK))


def ivf_tower(sf_dir: str):
    return _probe_core(spark, sf_dir, _frozen_score_structs(spark),
                       qids=QVIDS, topk=HYBRID_TOPK)


def ivf_candidates(sf_dir: str) -> int:
    """Rows entering the IVF tower's ranking window (probes x lists)."""
    e = load(spark, sf_dir, "embeddings")
    arr = _frozen_score_structs(spark)
    assign = e.select(
        "vec_id", F.array_min(arr)["centroid_id"].alias("centroid_id"))
    from tank_spark.llm.similarity import N_PROBE
    probes = (e.filter(F.col("vec_id").isin(*QVIDS))
              .select(F.col("vec_id").alias("qid"),
                      F.explode(F.slice(F.array_sort(arr), 1, N_PROBE))
                      .alias("p"))
              .select("qid", F.col("p.centroid_id").alias("centroid_id")))
    return (probes.join(assign, "centroid_id")
            .filter(F.col("vec_id") != F.col("qid")).count())


def timed(df) -> float:
    df.write.format("noop").mode("overwrite").save()  # warm-up
    runs = []
    for _ in range(runs_n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    runs.sort()
    return runs[len(runs) // 2]


print("| corpus | N vecs | tower | ranked candidates | wall (median) |")
print("|--------|--------|-------|-------------------|---------------|")
for label, d in (("1x", base_dir), ("10x", scaled_dir)):
    n = load(spark, d, "embeddings").count()
    brute_cand = len(QVIDS) * (n - 1)
    print(f"| {label} | {n} | brute | {brute_cand} |"
          f" {timed(brute_tower(d)):.2f}s |", flush=True)
    print(f"| {label} | {n} | ivf-probe | {ivf_candidates(d)} |"
          f" {timed(ivf_tower(d)):.2f}s |", flush=True)

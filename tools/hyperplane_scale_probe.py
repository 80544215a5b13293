"""How random-hyperplane LSH scales with corpus size, and how the
signature WIDTH bends the curve — the hyperplane family's version of
the nlist story (tools/semdedup_scale_probe.py).

At a FIXED signature width, bucket occupancy grows linearly with the
corpus, so (a) per-bucket candidate pairs grow quadratically and
(b) once buckets cross HP_BUCKET_CAP they are DROPPED and the planted
pairs inside them are lost — recall collapses, silently, exactly the
failure mode the cap exists to make visible. The dial is WIDTH: more
planes split distinct vectors into more buckets, restoring sub-cap
occupancy (copies of the SAME vector always share a bucket at any
width — which is fine: a 10-copy group is 45 true pairs, well under
the cap). This probe measures wall time, candidate volume, dropped
buckets, and planted-pair recall at sf0.1 and at the 10x directory
(tools/make_scale10.py), for BOTH registered configurations — the
2x8-bit default and the 2x12-bit production sizing
(neardup_hyperplane_lsh_pairs_w12) — through the production
width-parameterized builders (hyperplane._bands_relation), so the
measured law lives on the registered code path.

Usage: PYTHONPATH=/root/repo python tools/hyperplane_scale_probe.py \
        [SCALED_DIR] [RUNS]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

scaled_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10"
runs_n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
base_dir = "/root/testdata/sf0.1"

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.driver.memory", "48g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from tank_spark.llm.hyperplane import (  # noqa: E402
    HP_BUCKET_CAP,
    HP_TAU,
    INC_OFFSET,
    _bands_relation,
    _sem_corpus,
)
from tank_spark.llm.similarity import _dot_cols  # noqa: E402


def pairs_df(corpus, n_planes: int, n_bands: int):
    # the PRODUCTION signature/banding builder (hyperplane.py is
    # width-parameterized since r13) — the measured law runs on the
    # registered code path, not a probe-local re-derivation
    bands = _bands_relation(corpus, n_planes, n_bands)
    census = bands.groupBy("band_idx", "band_val").agg(
        F.count(F.lit(1)).alias("n"))
    keep = census.filter(F.col("n") <= HP_BUCKET_CAP) \
        .select("band_idx", "band_val")
    dropped = census.filter(F.col("n") > HP_BUCKET_CAP).count()
    kept = bands.join(F.broadcast(keep), ["band_idx", "band_val"])
    a = kept.select(F.col("vid").alias("vec_a"), "band_idx", "band_val")
    b2 = kept.select(F.col("vid").alias("vec_b"), "band_idx", "band_val")
    cand = (a.join(b2, ["band_idx", "band_val"])
            .filter(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b").distinct())
    ea = corpus.select(F.col("vid").alias("vec_a"),
                       F.col("embedding").alias("ea"))
    eb = corpus.select(F.col("vid").alias("vec_b"),
                       F.col("embedding").alias("eb"))
    cos = (_dot_cols(F.col("ea"), F.col("eb"))
           / (F.sqrt(_dot_cols(F.col("ea"), F.col("ea")))
              * F.sqrt(_dot_cols(F.col("eb"), F.col("eb")))))
    out = (cand.join(ea, "vec_a").join(eb, "vec_b")
           .select("vec_a", "vec_b", cos.alias("cosine"))
           .filter(F.col("cosine") >= HP_TAU))
    return out, cand, dropped


def probe(sf_dir: str, n_planes: int, n_bands: int) -> None:
    corpus = _sem_corpus(spark, sf_dir).localCheckpoint(eager=True)
    n = corpus.count()
    out, cand, dropped = pairs_df(corpus, n_planes, n_bands)
    n_cand = cand.count()
    found = out.localCheckpoint(eager=True)
    n_found = found.count()
    # planted recrawl recall: every orig%5==0 base vector has a
    # verbatim copy at orig+INC_OFFSET (cos 1.0) — a deterministic
    # catch unless its bucket was capped away
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    truth = e.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("vec_a"),
        (F.col("vec_id") + INC_OFFSET).alias("vec_b"))
    n_truth = truth.count()
    hit = truth.join(found.select("vec_a", "vec_b"),
                     ["vec_a", "vec_b"]).count()
    runs = []
    for _ in range(runs_n):
        t0 = time.perf_counter()
        o, _, _ = pairs_df(corpus, n_planes, n_bands)
        o.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    runs.sort()
    med = runs[len(runs) // 2]
    print(f"{sf_dir.split('/')[-1]:>8} planes={n_planes:>2} "
          f"bands={n_bands}x{n_planes // n_bands:<2} corpus={n:>6} "
          f"cand={n_cand:>8} dropped_buckets={dropped:>4} "
          f"found={n_found:>6} recrawl_recall={hit}/{n_truth} "
          f"wall_med={med:.2f}s")
    corpus.unpersist()


print(f"cap={HP_BUCKET_CAP} tau={HP_TAU}")
for sf in (base_dir, scaled_dir):
    for planes, bands in ((16, 2), (24, 2)):
        probe(sf, planes, bands)

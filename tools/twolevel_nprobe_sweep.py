"""VERDICT r11 #3: measure the two-level quantizer's production
operating point. The registered ivf_twolevel_recall_eval pins the
module defaults (W_COARSE=2, nprobe=2), whose recall@3 on the standing
2-query harness is 0.667 — the documented cost of 8.5x less scan.
SCALE.md claims "raise nprobe at k=64 and recall recovers while cost
stays list-linear"; this tool turns that claim into measured rows.

Sweep: (w_coarse, nprobe) in {2,3} x {2,4,8} over
  (a) the standing frozen query set (the registered entries' view), and
  (b) a 64-query evenly-spaced sample (the dial's real signal — two
      queries quantize recall to thirds),
at sf0.01 (the training SF) and optionally sf0.1 (SPARK_GRAFT_SF_DIR).
Reports mean recall@3, mean scan_frac, and wall time per config, plus
the flat-trained k=8 reference row (recall 1.000 at scan ~0.26).

Usage: PYTHONPATH=/root/repo python tools/twolevel_nprobe_sweep.py [sf_dir ...]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def sweep(spark, sf_dir):
    from tank_spark.llm import similarity as sim
    from tank_spark.sources.tables import load

    e = load(spark, sf_dir, "embeddings").cache()
    n = e.count()
    # 64 evenly spaced query ids that exist in this corpus
    ids = [r[0] for r in
           e.select("vec_id").orderBy("vec_id").collect()]
    step = max(1, len(ids) // 64)
    broad = tuple(ids[::step][:64])
    assign = e.select(
        "vec_id", sim._frozen2_assign_col(spark).alias("centroid_id"))

    print(f"\n== {sf_dir}  corpus={n} ==")
    print(f"{'qset':>6} {'W':>2} {'nprobe':>6} {'recall@3':>9} "
          f"{'scan_frac':>10} {'wall_s':>7}")

    def run(qids, label, w, p):
        t0 = time.time()
        probes = sim._frozen2_probes_df(spark, e, w, p, qids)
        pred = sim._probe_rank_tail(e, probes, assign, qids)
        row = (sim._recall_tail(e, assign, probes, pred, qids)
               .agg(F.avg("recall"), F.avg("scan_frac")).first())
        print(f"{label:>6} {w:>2} {p:>6} {row[0]:>9.3f} "
              f"{row[1]:>10.4f} {time.time() - t0:>7.1f}")

    # flat-trained k=8 reference (the recall bar the sweep must reach),
    # assembled from the same shared cores at each query set
    arr = sim._frozen_score_structs(spark)
    fa = e.select(
        "vec_id", F.array_min(arr)["centroid_id"].alias("centroid_id"))
    for label, qids in (("std", sim._IVF_QUERY_IDS), ("broad", broad)):
        t0 = time.time()
        fp = (e.filter(F.col("vec_id").isin(*qids))
              .select(F.col("vec_id").alias("qid"),
                      F.explode(F.slice(F.array_sort(arr), 1,
                                        sim.N_PROBE)).alias("p"))
              .select("qid", F.col("p.centroid_id").alias("centroid_id")))
        pr = sim._probe_rank_tail(e, fp, fa, qids)
        row = (sim._recall_tail(e, fa, fp, pr, qids)
               .agg(F.avg("recall"), F.avg("scan_frac")).first())
        print(f"{label:>6} k8-flat-trained ref {row[0]:>9.3f} "
              f"{row[1]:>10.4f} {time.time() - t0:>7.1f}")

    for label, qids in (("std", sim._IVF_QUERY_IDS), ("broad", broad)):
        for w in (2, 3):
            for p in (2, 4, 8):
                run(qids, label, w, p)
    e.unpersist()


def main():
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "32g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    for d in dirs:
        sweep(spark, d)


if __name__ == "__main__":
    main()

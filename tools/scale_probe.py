#!/usr/bin/env python
"""Measure how the key operators scale with input size: run each probe
query at sf0.1 and at the 10x directory (tools/make_scale10.py), report
median-of-3 warm times and the 10x/1x ratio. A plan that survives 100 TB
shows a ratio near the data ratio (~10) or below (broadcast/pruned
paths); a superlinear ratio flags a shuffle or pairwise blowup.

Usage: python tools/scale_probe.py [SCALED_DIR]
"""

from __future__ import annotations

import sys
import time


PROBES = [
    # scans / aggregation / joins
    "q1_pricing_summary", "q3_shipping_priority", "topk_orders_per_priority",
    # tile/heatmap (features derive from lineitem -> 10x density)
    "tile_z9_range", "heatmap_z9",
    # the full-fidelity overview encode — the designed-for scale ceiling
    "tile_mvt_z7_full",
    # the SERVING policy: budget-sampled overview + mid/high zooms
    "tile_mvt_batch",
    # llm pipeline
    "dedup_exact", "dedup_minhash_lsh_pairs", "dedup_minhash_lsh_pairs_k128",
    "dedup_lsh_pairs_capped",
    "passage_dedup", "rare_word_fraction", "text_repetition_signals",
    "gopher_quality_rules", "chunk_documents", "semdedup_prune",
    "sample_stratified_sources", "pack_token_budget", "token_count_bpe",
    "knn_brute_cosine", "ivf_probe_search", "embedding_sq_quantize",
    "sessionize_events", "event_value_outliers",
    # round-5 late additions: LM scoring, PQ family, trained classifier
    "lm_surprisal_score", "pq_encode_codes", "pq_adc_topk",
    "pq_recall_eval", "quality_lr_eval",
    # round-6 additions: cross-doc boilerplate/blocklist surface
    "boilerplate_segment_removal", "cross_doc_dup_ngram_fraction",
    "blocklist_filter_docs",
    # round-7 additions: scale-safe DSIR cut, per-source rank window
    # (documented-measured), pHash image near-dup, substring spans
    "dsir_importance_weights", "quality_percentile_rank",
    "image_phash_neardup", "dedup_substring_spans",
    "dedup_substring_removal", "image_phash_survivors", "media_resize",
    "quality_top_quantile_per_source",
    # late-r7 additions: the audio side of the multimodal pillar
    "audio_features", "audio_fingerprint_neardup", "audio_resample",
    # late-r7 additions: the video side (map-only decode kernels + the
    # shared banded Hamming join on temporal signatures)
    "video_scene_cuts", "video_phash_neardup", "video_keyframes",
    "media_dedup_survivors",
    # round-8 additions: incremental (delta) dedup against the corpus
    # index + the persisted index artifact
    "dedup_incremental_batch", "dedup_index_build",
    # round-8 additions: the sequential stream-replay twin and the
    # apply/report arc of cross-modality media dedup
    "dedup_incremental_stream_replay",
    "media_dedup_apply", "media_dedup_report",
    # late-r8 additions: quality-aware canonical pick, curriculum
    # staging (batched rank cuts), token-frequency spectrum
    "dedup_quality_survivors", "curriculum_quality_stages",
    "token_freq_spectrum",
]


def time_queries(spark, reg, sf_dir):
    times = {}
    for name in PROBES:
        q = reg[name]
        q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        times[name] = runs[1]
    return times


def main() -> None:
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scale_probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tank_spark.plans.registry import load_all

    reg = load_all()
    base = time_queries(spark, reg, "/root/testdata/sf0.1")
    big = time_queries(spark, reg, scaled)
    print(f"{'query':34s} {'1x':>7s} {'10x':>7s} {'ratio':>6s}")
    for n in PROBES:
        r = big[n] / base[n] if base[n] > 0 else float("nan")
        print(f"{n:34s} {base[n]:7.2f} {big[n]:7.2f} {r:6.1f}")
    spark.stop()


if __name__ == "__main__":
    main()

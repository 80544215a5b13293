"""Behavior tests for cluster formation (connected components), stratified
sampling, and sequence packing — invariants beyond the oracle parity sweep
(which covers exact values; these cover semantics on controlled inputs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_components_chain_and_islands(spark):
    """Min-label propagation must cross multi-hop chains (diameter > 1),
    not just direct pairs — the over-delete/under-delete distinction."""
    from tank_spark.llm.dedup import lsh_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "cid_a long, cid_b long",
    )
    got = {r["cid"]: (r["component"], r["is_canonical"])
           for r in lsh_components(pairs).collect()}
    assert got == {
        1: (1, 1), 2: (1, 0), 3: (1, 0), 4: (1, 0),
        10: (10, 1), 11: (10, 0),
        20: (20, 1), 21: (20, 0), 22: (20, 0),
    }


def test_components_empty_pairs(spark):
    from tank_spark.llm.dedup import lsh_components

    pairs = spark.createDataFrame([], "cid_a long, cid_b long")
    assert lsh_components(pairs).count() == 0


def test_clusters_cover_derived_dups(spark):
    """Every derived exact-dup (cid, cid+1M) must land in one cluster with
    the original as the canonical survivor."""
    from tank_spark.llm.dedup import dedup_lsh_clusters

    rows = {r["cid"]: r for r in dedup_lsh_clusters(spark, SF_DIR).collect()}
    from tank_spark.llm.dedup import DUP_OFFSET
    dup_cids = [c for c in rows if c >= DUP_OFFSET]
    assert dup_cids, "derived corpus should produce near-dup clusters"
    for c in dup_cids:
        # the dup's component is led by a real (< 1M) doc
        assert rows[c]["component"] < DUP_OFFSET
        assert rows[c]["is_canonical"] == 0


def test_stratified_sample_deterministic_and_stratified(spark):
    from tank_spark.llm.mixing import RATE_GROUPS, sample_stratified_sources
    from tank_spark.sources.tables import load

    a = sorted(r["doc_id"] for r in sample_stratified_sources(spark, SF_DIR).collect())
    b = sorted(r["doc_id"] for r in sample_stratified_sources(spark, SF_DIR).collect())
    assert a == b and len(a) > 0

    # rate-1.0 sources are kept in full
    full_sources = [s for r, grp in RATE_GROUPS if r == 1.0 for s in grp]
    docs = load(spark, SF_DIR, "documents")
    n_full = docs.filter(F.col("source").isin(full_sources)).count()
    sampled = sample_stratified_sources(spark, SF_DIR)
    assert sampled.filter(F.col("source").isin(full_sources)).count() == n_full
    # weight = 1/rate on every row
    bad = sampled.filter(F.abs(F.col("weight") * F.col("rate") - 1.0) > 1e-12)
    assert bad.count() == 0


def test_pack_token_budget_invariants(spark):
    from tank_spark.llm.mixing import SEQ_BUDGET, pack_token_budget

    rows = pack_token_budget(spark, SF_DIR).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    assert by_source
    for source, docs in by_source.items():
        docs.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in docs:
            # offsets are the exact running concatenation, no gaps
            assert r["start_off"] == off
            assert r["seq_first"] == r["start_off"] // SEQ_BUDGET
            end = r["start_off"] + r["n_tokens"] - 1
            assert r["seq_last"] == end // SEQ_BUDGET
            assert r["n_seqs"] == r["seq_last"] - r["seq_first"] + 1
            off += r["n_tokens"]


def test_repetition_signals_bounds(spark):
    from tank_spark.llm.text import text_repetition_signals

    rows = text_repetition_signals(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_words"] > 0
        assert 0.0 <= r["dup_word_frac"] < 1.0
        assert 0.0 < r["top_word_frac"] <= 1.0
        assert 0.0 <= r["top_bigram_frac"] <= 1.0


def test_repetition_signals_synthetic(spark):
    """A maximally repetitive doc vs an all-distinct doc, checked against
    hand-computed fractions through a temp view of the documents schema."""
    from tank_spark.llm import text as text_mod

    df = spark.createDataFrame(
        [(1, "spam spam spam spam", "en", "s", 19),
         (2, "one two three four", "en", "s", 18)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = text_mod.load  # text.py binds `load` at import time
    try:
        text_mod.load = lambda spark_, sf_, name, **kw: df
        rows = {r["doc_id"]: r
                for r in text_mod.text_repetition_signals(spark, "ignored").collect()}
    finally:
        text_mod.load = orig
    assert rows[1]["dup_word_frac"] == 0.75      # 4 words, 1 distinct
    assert rows[1]["top_word_frac"] == 1.0
    assert rows[1]["top_bigram_frac"] == 1.0     # "spam spam" x3
    assert rows[2]["dup_word_frac"] == 0.0
    assert rows[2]["top_word_frac"] == 0.25
    assert abs(rows[2]["top_bigram_frac"] - 1 / 3) < 1e-15


def test_kmeans_partitions_corpus(spark):
    """Every vector lands in exactly one inverted list; lists are
    non-empty with the seeded init; c_emb keeps the declared dim."""
    from tank_spark.llm.similarity import N_CENTROIDS, train_kmeans
    from tank_spark.sources.tables import load

    n_vecs = load(spark, SF_DIR, "embeddings").count()
    cents = train_kmeans(spark, SF_DIR).collect()
    assert len(cents) == N_CENTROIDS
    assert sum(r["n_members"] for r in cents) == n_vecs
    assert all(len(r["c_emb"]) == 64 for r in cents)
    assert all(r["n_members"] > 0 for r in cents)


def test_kmeans_deterministic_assignment_counts(spark):
    """Two runs produce identical list sizes (argmin ties broken by
    centroid_id; the corpus and init are deterministic)."""
    from tank_spark.llm.similarity import ivf_train_kmeans

    a = sorted((r["centroid_id"], r["n_members"])
               for r in ivf_train_kmeans(spark, SF_DIR).collect())
    b = sorted((r["centroid_id"], r["n_members"])
               for r in ivf_train_kmeans(spark, SF_DIR).collect())
    assert a == b


def test_pack_excludes_empty_docs(spark):
    """0-token docs occupy no sequence and must not emit a packing row
    (also guards the Spark-DIV-vs-DuckDB-floor divergence at offset -1)."""
    from tank_spark.llm import mixing as mixing_mod

    df = spark.createDataFrame(
        [(1, "   ", "en", "s", 3),          # whitespace only: 0 tokens
         (2, "one two", "en", "s", 7),
         (3, "three four five", "en", "s", 15)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = mixing_mod.load
    try:
        mixing_mod.load = lambda spark_, sf_, name, **kw: df
        rows = {r["doc_id"]: r
                for r in mixing_mod.pack_token_budget(spark, "ignored").collect()}
    finally:
        mixing_mod.load = orig
    assert set(rows) == {2, 3}
    assert rows[2]["start_off"] == 0 and rows[2]["n_tokens"] == 2
    assert rows[3]["start_off"] == 2  # empty doc contributed nothing


def test_components_match_union_find_on_random_graph(spark):
    """One seeded 300-edge random graph: the distributed pointer-jumping
    result must equal a pure-Python union-find ground truth."""
    import random

    from tank_spark.llm.dedup import lsh_components

    rng = random.Random(42)
    edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(300)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(120))

    def find(v):
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {v for e in edges for v in e}
    truth = {v: find(v) for v in nodes}
    # union-find roots are not guaranteed minimal; canonicalize per class
    by_root: dict[int, int] = {}
    for v in sorted(nodes):
        by_root.setdefault(truth[v], v)
    truth = {v: by_root[truth[v]] for v in nodes}

    pairs = spark.createDataFrame(edges, "cid_a long, cid_b long")
    got = {r["cid"]: r["component"] for r in lsh_components(pairs).collect()}
    assert got == truth


def test_pack_invariants_random_corpus(spark):
    """Randomized doc lengths across sources: offsets must be the exact
    running concatenation and sequence spans the exact integer math."""
    import random

    from tank_spark.llm import mixing as mixing_mod

    rng = random.Random(7)
    rows = [
        (i, " ".join("w" for _ in range(rng.randrange(0, 600))),
         "en", f"s{rng.randrange(4)}", 0)
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = mixing_mod.load
    try:
        mixing_mod.load = lambda spark_, sf_, name, **kw: df
        got = mixing_mod.pack_token_budget(spark, "ignored").collect()
    finally:
        mixing_mod.load = orig

    budget = mixing_mod.SEQ_BUDGET
    expected_tokens = {i: len(t.split()) for i, t, *_ in rows}
    by_source: dict[str, list] = {}
    for r in got:
        assert r["n_tokens"] == expected_tokens[r["doc_id"]] > 0
        by_source.setdefault(r["source"], []).append(r)
    n_nonempty = sum(1 for t in expected_tokens.values() if t > 0)
    assert sum(len(v) for v in by_source.values()) == n_nonempty
    for docs in by_source.values():
        docs.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in docs:
            assert r["start_off"] == off
            assert r["seq_first"] == off // budget
            assert r["seq_last"] == (off + r["n_tokens"] - 1) // budget
            off += r["n_tokens"]


def test_training_mix_pipeline_nonempty(spark):
    """The flagship pipeline must actually KEEP documents at the checked
    scale — a quality cut above the corpus max would pass its oracle
    check vacuously on two empty results (ADVICE r2, medium)."""
    from tank_spark.llm.mixing import training_mix_pipeline
    from tank_spark.sources.tables import load

    rows = training_mix_pipeline(spark, SF_DIR).collect()
    assert len(rows) > 0
    # and the stages did real work: the kept set is a strict subset
    n_docs = load(spark, SF_DIR, "documents").count()
    assert len(rows) < n_docs
    assert all(r["n_tokens"] > 0 and r["start_off"] >= 0 for r in rows)


def test_lsh_recall_eval_bounds(spark):
    """Recall/precision are well-defined and the checked config actually
    finds the synthesized exact dups (recall = 1.0 on them)."""
    from tank_spark.llm.dedup import lsh_recall_eval

    r = lsh_recall_eval(spark, SF_DIR).collect()[0]
    assert r["n_truth"] > 0, "vacuous eval: no ground-truth pairs"
    assert 0.0 <= r["recall"] <= 1.0 and 0.0 <= r["precision"] <= 1.0
    assert r["n_hit"] <= min(r["n_truth"], r["n_pred"])
    # every synthesized dup (upper() copy) is jaccard-1.0 — an LSH config
    # that misses those is broken
    assert r["recall"] == 1.0


def test_prefix_containment_finds_truncations(spark):
    """Every synthesized half-length truncation is detected against its
    parent doc, and each detected pair is a true character prefix."""
    from tank_spark.llm.dedup import dedup_prefix_containment, _prefix_corpus_df

    pairs = dedup_prefix_containment(spark, SF_DIR).collect()
    assert pairs, "vacuous: no prefix pairs at checked scale"
    got = {(r["cid_removed"], r["cid_kept"]) for r in pairs}
    # parent relation: truncated copy cid = doc_id + 2000000
    n_trunc = _prefix_corpus_df(spark, SF_DIR).filter("cid >= 2000000").count()
    parents = {(c, c - 2000000) for c, _ in
               ((r["cid_removed"], r) for r in pairs) if c >= 2000000}
    assert len(parents) == n_trunc, "a synthesized truncation went undetected"
    for r in pairs:
        assert r["len_short"] < r["len_long"]


def test_token_budget_planning_shares(spark):
    """Budget shares are proportional to weights and sum to the budget."""
    from tank_spark.llm.mixing import TOKEN_BUDGET_TOTAL, token_budget_planning

    rows = token_budget_planning(spark, SF_DIR).collect()
    assert rows
    total_target = sum(r["target_tokens"] for r in rows)
    assert abs(total_target - TOKEN_BUDGET_TOTAL) < 1e-6 * TOKEN_BUDGET_TOTAL
    for r in rows:
        assert r["epochs"] > 0
        # target/weight ratio constant across sources
    base = rows[0]["target_tokens"] / rows[0]["w"]
    for r in rows:
        assert abs(r["target_tokens"] / r["w"] - base) < 1e-9 * base


def test_cross_source_duplication_symmetry(spark):
    """Containment fractions are consistent with the shared counts and
    the pair grid is upper-triangular (source_a < source_b)."""
    from tank_spark.llm.dedup import cross_source_duplication

    rows = cross_source_duplication(spark, "/root/testdata/sf0.01").collect()
    assert rows, "vacuous: no cross-source prefix overlap at sf0.01"
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0 < r["n_shared"] <= min(r["n_fp_a"], r["n_fp_b"])
        assert abs(r["frac_of_a"] - r["n_shared"] / r["n_fp_a"]) < 1e-12
        assert abs(r["frac_of_b"] - r["n_shared"] / r["n_fp_b"]) < 1e-12


def test_passage_dedup_flags_twins(spark):
    """Every upper-cased twin lowercases to its parent verbatim, so ALL
    of both docs' windows must be flagged duplicated (permille == 1000);
    the fraction stays consistent with the counts everywhere."""
    from tank_spark.llm.dedup import passage_dedup

    rows = {r["cid"]: r for r in passage_dedup(spark, SF_DIR).collect()}
    from tank_spark.llm.dedup import DUP_OFFSET
    twins = [cid for cid in rows if cid >= DUP_OFFSET]
    assert twins, "vacuous: derived corpus has no twins"
    for cid in twins:
        assert rows[cid]["dup_permille"] == 1000
        assert rows[cid - DUP_OFFSET]["dup_permille"] == 1000
    for r in rows.values():
        assert 0 <= r["n_dup_chunks"] <= r["n_chunks"]
        assert r["dup_permille"] == r["n_dup_chunks"] * 1000 // r["n_chunks"]
    assert any(r["n_dup_chunks"] < r["n_chunks"] for r in rows.values()), \
        "vacuous: every window in the corpus is duplicated"


def test_event_value_outliers_tail_only(spark):
    """The 3-sigma filter keeps a real but small tail: non-empty, and
    every kept value is beyond 3 sample sigmas of its type's mean."""
    from tank_spark.llm.events import event_value_outliers
    from tank_spark.sources.tables import read_events

    out = event_value_outliers(spark, SF_DIR).collect()
    assert out, "vacuous: no outliers at checked scale"
    ev = read_events(spark, SF_DIR)
    assert len(out) < ev.count() * 0.05
    import statistics

    by_type = {}
    for r in ev.select("event_type", "value").collect():
        by_type.setdefault(r["event_type"], []).append(r["value"])
    for r in out:
        vs = by_type[r["event_type"]]
        mu = statistics.fmean(vs)
        sigma = statistics.pstdev(vs)
        assert abs(r["value_micro"] / 1e6 - mu) > 3 * sigma * 0.999999


def test_rare_word_fraction_bounds(spark):
    from tank_spark.llm.text import rare_word_fraction

    rows = rare_word_fraction(spark, SF_DIR).collect()
    assert rows
    assert any(r["n_rare"] > 0 for r in rows), "vacuous: no rare words"
    for r in rows:
        assert 0 <= r["n_rare"] <= r["n_words"]
        assert r["rare_permille"] == r["n_rare"] * 1000 // r["n_words"]


def test_embedding_sq_quantize_covers_code_range(spark):
    """Min/max are global per dimension, so some vector must hit code 0
    and some must hit 255; reconstruction error is bounded by half a
    bucket of the widest dimension."""
    from tank_spark.llm.similarity import embedding_sq_quantize

    rows = embedding_sq_quantize(spark, SF_DIR).collect()
    assert rows and all(r["n_dims"] == 64 for r in rows)
    assert min(r["min_code"] for r in rows) == 0
    assert max(r["max_code"] for r in rows) == 255
    for r in rows:
        # mean abs error under half a bucket of a [-8, 8]-ish range
        assert r["sum_err_micro"] / r["n_dims"] < (16.0 / 256 / 2) * 1e6 * 1.01


def test_dedup_event_stream_replay_matches_clean_feed(spark):
    """Redelivering every event twice then deduping must reproduce the
    clean single-delivery aggregate exactly."""
    from tank_spark.llm.events import dedup_event_stream_replay
    from tank_spark.sources.tables import read_events
    from pyspark.sql import functions as F

    got = {r["event_type"]: (r["n_events"], r["sum_value_micro"])
           for r in dedup_event_stream_replay(spark, SF_DIR).collect()}
    clean = {r["event_type"]: (r["n"], r["s"]) for r in
             read_events(spark, SF_DIR)
             .groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.round(F.col("value") * 1000000.0, 0).cast("long")).alias("s"))
             .collect()}
    assert got == clean


def test_temperature_mix_weights_flattens(spark):
    """tau=2 reweighting: shares sum to ~1e6, every derived figure is
    consistent, and the share imbalance is the square root of the token
    imbalance (flattening, the point of temperature sampling)."""
    import math

    from tank_spark.llm.mixing import temperature_mix_weights

    rows = temperature_mix_weights(spark, SF_DIR).collect()
    assert rows
    assert abs(sum(r["share_permicro"] for r in rows) - 1_000_000) <= len(rows)
    tok_sum = sum(r["n_tokens"] for r in rows)
    for r in rows:
        assert r["w_micro"] == round(math.sqrt(r["n_tokens"]) * 1e6)
        assert r["target_tokens"] == r["share_permicro"] * tok_sum // 1_000_000
        assert r["epochs_permille"] == r["target_tokens"] * 1000 // r["n_tokens"]
    big = max(rows, key=lambda r: r["n_tokens"])
    small = min(rows, key=lambda r: r["n_tokens"])
    tok_ratio = big["n_tokens"] / small["n_tokens"]
    share_ratio = big["share_permicro"] / small["share_permicro"]
    assert 1.0 < share_ratio < tok_ratio  # flattened but order-preserving
    assert abs(share_ratio - math.sqrt(tok_ratio)) < 0.01 * math.sqrt(tok_ratio)


def test_temperature_weights_petabyte_no_overflow(spark):
    """The share/target/epoch intermediates run in DECIMAL(38,0): at
    petabyte token counts the old BIGINT products (w_micro * 1e6) raised
    ARITHMETIC_OVERFLOW under ANSI mode. Expected values are computed in
    Python big-int arithmetic (exact)."""
    import math

    from pyspark.sql import functions as F

    rows = [("a", 10**18), ("b", 4 * 10**16)]
    df = spark.createDataFrame(rows, "source string, n_tokens long")
    w = df.withColumn(
        "w_micro",
        F.round(F.sqrt(F.col("n_tokens").cast("double")) * 1e6, 0).cast("long"),
    )
    tot = w.agg(F.sum("w_micro").cast("long").alias("w_sum"),
                F.sum("n_tokens").cast("long").alias("tok_sum"))
    out = {
        r["source"]: r
        for r in (
            w.crossJoin(F.broadcast(tot))
            .withColumn("share_permicro", F.expr(
                "CAST(CAST(w_micro AS DECIMAL(38,0)) * 1000000 DIV w_sum AS BIGINT)"))
            .withColumn("target_tokens", F.expr(
                "CAST(CAST(share_permicro AS DECIMAL(38,0)) * tok_sum DIV 1000000 AS BIGINT)"))
            .withColumn("epochs_permille", F.expr(
                "CAST(CAST(target_tokens AS DECIMAL(38,0)) * 1000 DIV n_tokens AS BIGINT)"))
            .collect()
        )
    }
    w_micro = {s: round(math.sqrt(float(n)) * 1e6) for s, n in rows}
    w_sum = sum(w_micro.values())
    tok_sum = sum(n for _, n in rows)
    for s, n in rows:
        share = w_micro[s] * 10**6 // w_sum
        target = share * tok_sum // 10**6
        epochs = target * 1000 // n
        assert out[s]["share_permicro"] == share
        assert out[s]["target_tokens"] == target
        assert out[s]["epochs_permille"] == epochs


def test_export_shards_conserve_tokens(spark):
    """Every corpus token lands in EXACTLY one shard: the plan's total
    token mass must equal the corpus token count, and each (source,
    shard) mass must be positive and <= SHARD_TOKENS."""
    from pyspark.sql import functions as F

    from tank_spark.llm.mixing import SHARD_TOKENS, export_shard_plan
    from tank_spark.sources.tables import load

    plan = export_shard_plan(spark, SF_DIR).collect()
    assert plan
    total = load(spark, SF_DIR, "documents").select(
        F.sum(F.size(F.regexp_extract_all(
            "text", F.lit(r"\S+"), F.lit(0)))).alias("n")).first()["n"]
    assert sum(r["n_tokens"] for r in plan) == total
    for r in plan:
        assert 0 < r["n_tokens"] <= SHARD_TOKENS
    # non-vacuous: sources split into multiple shards at this SF
    by_src = {}
    for r in plan:
        by_src.setdefault(r["source"], []).append(r["shard_id"])
    assert all(len(s) >= 2 for s in by_src.values())
    # shard ids are dense per source (0..max, no gaps — the packed
    # stream has no holes)
    for s, ids in by_src.items():
        assert sorted(ids) == list(range(len(ids))), s


def test_write_training_shards_roundtrip(spark, tmp_path):
    """The materialized export matches the plan: every non-empty doc is
    written exactly once, into the shard where its token range starts,
    and the partition layout reconstructs the plan's doc spans."""
    from pyspark.sql import functions as F

    from tank_spark.llm.mixing import (
        SHARD_TOKENS, export_shard_plan, write_training_shards)
    from tank_spark.sources.tables import load

    out = str(tmp_path / "shards")
    write_training_shards(spark, SF_DIR, out)
    back = spark.read.parquet(out)
    n_nonempty = load(spark, SF_DIR, "documents").filter(
        F.size(F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0))) > 0
    ).count()
    assert back.count() == n_nonempty
    assert back.select("doc_id").distinct().count() == n_nonempty
    # partition assignment is the plan's arithmetic
    bad = back.filter(
        F.expr(f"start_off DIV {SHARD_TOKENS}") != F.col("shard_id")).count()
    assert bad == 0
    # every doc STARTING in a shard is within the plan's doc span there
    plan = {(r["source"], r["shard_id"]): r
            for r in export_shard_plan(spark, SF_DIR).collect()}
    for r in back.groupBy("source", "shard_id").agg(
            F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")).collect():
        p = plan[(r["source"], r["shard_id"])]
        assert p["first_doc"] <= r["lo"] and r["hi"] <= p["last_doc"]

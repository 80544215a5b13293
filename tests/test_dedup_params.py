"""Parameterized dedup configurations beyond the oracle-checked toys:
production-sized MinHash banding and 64-bit SimHash."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_minhash_production_params(spark):
    """K=32 permutations in bands of 4 (s-curve threshold ~0.59) through
    the same parameterized builders: every derived exact-dup pair (cid,
    cid+1000000) must surface with est_jaccard = 1.0."""
    from tank_spark.llm.dedup import corpus_df, minhash_lsh_pairs

    pairs = {
        (r["cid_a"], r["cid_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(spark, SF_DIR, k=32, band_w=4).collect()
    }
    dup_cids = [
        r["cid"] for r in corpus_df(spark, SF_DIR)
        .filter(F.col("cid") >= 1000000).select("cid").collect()
    ]
    assert len(dup_cids) > 0
    for cid in dup_cids:
        base = cid - 1000000
        est = pairs.get((base, cid))
        # derived dups are exact after normalization -> identical shingle
        # sets -> identical signatures at any K (docs with <3 words have
        # no shingles and legitimately produce no pair)
        if est is not None:
            assert est == 1.0
    found = sum(1 for cid in dup_cids if (cid - 1000000, cid) in pairs)
    assert found >= 0.9 * len(dup_cids)


def test_simhash64_dup_invariance(spark):
    """64-bit xxhash64 SimHash: derived dups (case-changed copies) hash to
    IDENTICAL codes — word extraction lowercases, so the word multiset is
    unchanged. Distinct docs overwhelmingly differ."""
    from tank_spark.llm.dedup import simhash64_df

    codes = {r["cid"]: r["simhash64"] for r in simhash64_df(spark, SF_DIR).collect()}
    dups = [c for c in codes if c >= 1000000]
    assert len(dups) > 0
    for cid in dups:
        assert codes[cid] == codes[cid - 1000000]
    originals = [codes[c] for c in codes if c < 1000000]
    assert len(set(originals)) > 0.9 * len(originals)


def test_band_bucket_cap_drops_hot_buckets(spark, tmp_path):
    """Skew guard: a boilerplate-dominated slice lands in mega band
    buckets whose pair output is quadratic; with max_band_bucket the hot
    buckets are dropped while pairs among normal docs are untouched."""
    import pandas as pd

    from tank_spark.llm.dedup import minhash_lsh_pairs

    base = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    boiler = " ".join(f"boiler{w} lorem{w} ipsum{w} dolor{w}"
                      for w in range(15))
    hot = base["doc_id"] < 80
    base.loc[hot, "text"] = [
        f"{boiler} tlu{d} tlv{d} tlw{d} tlx{d}"
        for d in base.loc[hot, "doc_id"]
    ]
    base["n_chars"] = base["text"].str.len()
    d = tmp_path / "skew"
    d.mkdir()
    base.to_parquet(d / "documents.parquet", index=False)

    def pair_sets(cap):
        df = minhash_lsh_pairs(spark, str(d), max_band_bucket=cap)
        return {(r["cid_a"], r["cid_b"]) for r in df.collect()}

    def is_hot(cid):
        return (cid % 1000000) < 80  # +1e6 = the upper-cased corpus twin

    uncapped = pair_sets(None)
    capped = pair_sets(50)
    hot_un = {p for p in uncapped if is_hot(p[0]) and is_hot(p[1])}
    hot_cap = {p for p in capped if is_hot(p[0]) and is_hot(p[1])}

    # ~120 hot docs (80 + 40 upper twins) -> thousands of quadratic pairs
    assert len(hot_un) > 2000
    # the cap removes the mega buckets (a few sub-cap stragglers may stay)
    assert len(hot_cap) < len(hot_un) / 5
    # pairs among NORMAL docs are identical — the guard is surgical
    assert (uncapped - hot_un) == (capped - hot_cap)

    # round-5 default flip: calling with NO cap argument must be the
    # GUARDED behavior — a user reaching for the obvious name on a
    # boilerplate corpus gets the capped plan (VERDICT r4 #2)
    default = {(r["cid_a"], r["cid_b"])
               for r in minhash_lsh_pairs(spark, str(d)).collect()}
    assert default == capped


def test_new_curation_ops_non_vacuous(spark):
    """semdedup_prune and gopher_quality_rules must exercise both sides
    of their cut at every SF (a threshold that prunes nothing checks
    nothing — the round-2 vacuous-cut lesson)."""
    from tests.conftest import SF_DIR

    from tank_spark.plans.registry import load_all

    reg = load_all()
    sd = reg["semdedup_prune"].spark(spark, SF_DIR).groupBy("is_pruned").count()
    counts = {r["is_pruned"]: r["count"] for r in sd.collect()}
    assert counts.get(0, 0) > 0 and counts.get(1, 0) > 0

    gq = reg["gopher_quality_rules"].spark(spark, SF_DIR).groupBy("passes").count()
    counts = {r["passes"]: r["count"] for r in gq.collect()}
    assert counts.get(0, 0) > 0 and counts.get(1, 0) > 0

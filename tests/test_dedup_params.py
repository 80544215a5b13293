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

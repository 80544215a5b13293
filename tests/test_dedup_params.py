"""Parameterized dedup configurations beyond the oracle-checked toys:
production-sized MinHash banding and 64-bit SimHash."""

from __future__ import annotations

from pyspark.sql import functions as F

from tank_spark.llm.dedup import DUP_OFFSET
from tests.conftest import SF_DIR


def test_minhash_production_params(spark):
    """K=32 permutations in bands of 4 (s-curve threshold ~0.59) through
    the same parameterized builders: every derived exact-dup pair (cid,
    cid+DUP_OFFSET) must surface with est_jaccard = 1.0."""
    from tank_spark.llm.dedup import corpus_df, minhash_lsh_pairs

    pairs = {
        (r["cid_a"], r["cid_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(spark, SF_DIR, k=32, band_w=4).collect()
    }
    dup_cids = [
        r["cid"] for r in corpus_df(spark, SF_DIR)
        .filter(F.col("cid") >= DUP_OFFSET).select("cid").collect()
    ]
    assert len(dup_cids) > 0
    for cid in dup_cids:
        base = cid - DUP_OFFSET
        est = pairs.get((base, cid))
        # derived dups are exact after normalization -> identical shingle
        # sets -> identical signatures at any K (docs with <3 words have
        # no shingles and legitimately produce no pair)
        if est is not None:
            assert est == 1.0
    found = sum(1 for cid in dup_cids if (cid - DUP_OFFSET, cid) in pairs)
    assert found >= 0.9 * len(dup_cids)


def test_simhash64_dup_invariance(spark):
    """64-bit xxhash64 SimHash: derived dups (case-changed copies) hash to
    IDENTICAL codes — word extraction lowercases, so the word multiset is
    unchanged. Distinct docs overwhelmingly differ."""
    from tank_spark.llm.dedup import simhash64_df

    codes = {r["cid"]: r["simhash64"] for r in simhash64_df(spark, SF_DIR).collect()}
    dups = [c for c in codes if c >= DUP_OFFSET]
    assert len(dups) > 0
    for cid in dups:
        assert codes[cid] == codes[cid - DUP_OFFSET]
    originals = [codes[c] for c in codes if c < DUP_OFFSET]
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
        return (cid % DUP_OFFSET) < 80  # +offset = the upper-cased corpus twin

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


# ------------------------------------------------------- simhash64 twin

def _xxh64(data: bytes, seed: int) -> int:
    """Pure-Python XXH64 (public spec) — the independent twin for Spark's
    xxhash64. Validated against the engine inside the test before use."""
    P1, P2, P3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
    P4, P5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5
    M = (1 << 64) - 1

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & M

    def rnd(acc: int, inp: int) -> int:
        acc = (acc + inp * P2) & M
        return (rotl(acc, 31) * P1) & M

    n, i = len(data), 0
    if n >= 32:
        v1, v2 = (seed + P1 + P2) & M, (seed + P2) & M
        v3, v4 = seed & M, (seed - P1) & M
        while i <= n - 32:
            v1 = rnd(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = rnd(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = rnd(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = rnd(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h = ((h ^ rnd(0, v)) * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i <= n - 8:
        h ^= rnd(0, int.from_bytes(data[i:i + 8], "little"))
        h = (rotl(h, 27) * P1 + P4) & M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & M
        h = (rotl(h, 23) * P2 + P3) & M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (rotl(h, 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def test_simhash64_python_twin(spark):
    """Value-level pin for the rows-only dedup_simhash64 (VERDICT r5 #6):
    recompute every doc's 64-bit code from scratch in Python — regex
    tokenization, pure-Python XXH64 word hashes (Spark seeds with 42),
    per-bit majority vote, two's-complement bit packing — and require
    exact equality with the Spark plan's codes."""
    import re

    from pyspark.sql import functions as F

    from tank_spark.llm.dedup import corpus_df, simhash64_df

    # calibrate the twin: the pure-Python XXH64 must match the engine
    probe = spark.createDataFrame(
        [("a",), ("hello",), ("0123456789abcdef0123456789abcdef xyz",)],
        ["w"],
    ).select("w", F.xxhash64("w").alias("h")).collect()
    for r in probe:
        got = _xxh64(r["w"].encode(), 42)
        want = r["h"] & ((1 << 64) - 1)
        assert got == want, f"XXH64 twin diverges on {r['w']!r}"

    texts = {r["cid"]: r["text"]
             for r in corpus_df(spark, SF_DIR).collect()}
    spark_codes = {r["cid"]: r["simhash64"]
                   for r in simhash64_df(spark, SF_DIR).collect()}
    word_re = re.compile(r"[a-z0-9]+")
    checked = 0
    for cid, text in texts.items():
        words = word_re.findall(text.lower())
        if not words:
            continue  # no words -> no groupBy row on the Spark side
        votes = [0] * 64
        for w in words:
            h = _xxh64(w.encode(), 42)
            for b in range(64):
                votes[b] += 1 if (h >> b) & 1 else -1
        code = sum(1 << b for b in range(64) if votes[b] > 0)
        if code >= 1 << 63:
            code -= 1 << 64  # Spark packs into a signed long
        assert spark_codes[cid] == code, f"cid {cid}: {spark_codes[cid]} != {code}"
        checked += 1
    assert checked > 100


def test_boilerplate_ops_non_vacuous(spark):
    """The three cross-doc text ops must exercise both sides of their
    cut at the test SF (vacuous-cut lesson): segments actually removed,
    docs actually flagged, docs actually blocked — and their negatives."""
    from tank_spark.plans.registry import load_all

    reg = load_all()
    for name, col in (
        ("boilerplate_segment_removal", "n_removed"),
        ("cross_doc_dup_ngram_fraction", "flagged"),
        ("blocklist_filter_docs", "is_blocked"),
    ):
        df = reg[name].spark(spark, SF_DIR)
        pos = df.filter(F.col(col) > 0).count()
        neg = df.filter(F.col(col) == 0).count()
        assert pos > 0 and neg > 0, f"{name}: {col} pos={pos} neg={neg}"


def test_sliding_segs_short_doc_emits_no_rows(spark):
    """Docs shorter than the sliding window must emit ZERO segment rows,
    not crash: sequence(0, -1, 1) throws in Spark, so _segs_df branches
    to an empty array (ADVICE r6 — latent until the testdata generator
    ships a <4-word doc, which it has changed twice before)."""
    from tank_spark.llm.text import _segs_df

    d = spark.createDataFrame(
        [(1, "s", ""), (2, "s", "one"), (3, "s", "three words here"),
         (4, "s", "exactly four words now"), (5, "s", "a b c d e")],
        "doc_id long, source string, text string",
    )
    rows = _segs_df(d, 4, sliding=True).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["seg"])
    assert set(by_doc) == {4, 5}
    assert by_doc[4] == ["exactly four words now"]
    assert by_doc[5] == ["a b c d", "b c d e"]


def test_substring_spans_merge_and_offsets(spark, tmp_path):
    """Interval-merge semantics on a crafted corpus: overlapping
    duplicated windows coalesce into ONE maximal span per doc with
    correct word indices and char ranges; disjoint duplicated regions
    stay separate spans."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = [
        (0, "s", "aa bb common run of words here tail one"),
        (1, "s", "zz common run of words here other end"),
        # doc 2: TWO disjoint duplicated regions (shares the run above
        # AND the closing 4-gram of doc 3)
        (2, "s", "common run of words here mid gap gap gap ending four gram tail"),
        (3, "s", "xx yy zz ww ending four gram tail"),
    ]
    tbl = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "source": pa.array([d[1] for d in docs]),
        "lang": pa.array(["en"] * len(docs)),
        "text": pa.array([d[2] for d in docs]),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    from tank_spark.llm.text import dedup_substring_spans

    rows = dedup_substring_spans(spark, str(tmp_path)).collect()
    spans = {}
    for r in rows:
        spans.setdefault(r["doc_id"], []).append(r)
    assert {k: len(v) for k, v in sorted(spans.items())} == {0: 1, 1: 1, 2: 2, 3: 1}
    a = spans[0][0]
    assert (a["span_start_word"], a["span_end_word"]) == (2, 6)
    assert a["span_text"] == "common run of words here"
    assert a["start_char"] == len("aa bb ")
    assert a["end_char"] == a["start_char"] + len(a["span_text"])
    # every span's char range re-slices its own text exactly
    texts = {d[0]: d[2] for d in docs}
    for doc_spans in spans.values():
        for r in doc_spans:
            assert texts[r["doc_id"]][r["start_char"]:r["end_char"]] == r["span_text"]
    # doc 2's two regions must NOT merge across the gap
    s2 = sorted(spans[2], key=lambda r: r["span_start_word"])
    assert s2[0]["span_text"] == "common run of words here"
    assert s2[1]["span_text"] == "ending four gram tail"


def test_substring_removal_splices_spans_exactly(spark, tmp_path):
    """The apply step: every word covered by a duplicated span is gone,
    every other word survives in order — and untouched docs pass through
    verbatim."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = [
        (0, "s", "aa bb common run of words here tail one"),
        (1, "s", "zz common run of words here other end"),
        (2, "s", "totally unrelated content with plenty unique words"),
    ]
    tbl = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "source": pa.array([d[1] for d in docs]),
        "lang": pa.array(["en"] * len(docs)),
        "text": pa.array([d[2] for d in docs]),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    from tank_spark.llm.text import dedup_substring_removal

    got = {r["doc_id"]: r for r in
           dedup_substring_removal(spark, str(tmp_path)).collect()}
    assert got[0]["clean_text"] == "aa bb tail one"
    assert (got[0]["n_words"], got[0]["n_kept"], got[0]["n_removed"]) == (9, 4, 5)
    assert got[1]["clean_text"] == "zz other end"
    assert got[2]["clean_text"] == docs[2][2]
    assert got[2]["n_removed"] == 0


def _minhash_bands_twin(text: str) -> tuple[str, set[tuple[int, str]]]:
    """Pure-Python twin of the checked-config fingerprint + band digests
    (K=12 salted-md5 minima, 6 bands of 2) — pins the semantics of the
    incremental-dedup probes independently of Spark AND DuckDB."""
    import hashlib
    import re

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    fp = md5(re.sub(r"\s+", " ", text).lower())
    words = re.findall(r"[a-z0-9]+", text.lower())
    shingles = {" ".join(words[i:i + 3]) for i in range(len(words) - 2)}
    bands: set[tuple[int, str]] = set()
    if shingles:
        mins = [min(md5(f"{s}:{i}") for s in shingles) for i in range(12)]
        bands = {(b, md5(mins[2 * b] + mins[2 * b + 1])) for b in range(6)}
    return fp, bands


def test_incremental_dedup_dispositions(spark, tmp_path):
    """Every disposition of dedup_incremental_batch on a crafted corpus,
    with expectations computed by the pure-Python minhash twin (not
    hardcoded): verbatim re-crawl -> exact_dup_of_index, twice-emitted
    synthetic docs -> new_unique + dup_in_batch, suffix-extended docs ->
    near/new exactly as the band overlap dictates."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tank_spark.llm.dedup import (
        INC_BATCH_OFFSET, dedup_incremental_batch)

    texts = {
        3: "the quick brown fox jumps over the lazy dog near the riverbank today",
        8: "data pipelines shuffle partitions across executors while catalyst "
           "optimizes the logical plan into efficient physical stages",
        13: "completely different content about cooking pasta with fresh basil "
            "and ripe tomatoes from the garden",
        1: "an unrelated index document describing mountain weather patterns "
           "and seasonal snowfall accumulation rates",
    }
    ids = sorted(texts)
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "source": pa.array(["s"] * len(ids)),
        "lang": pa.array(["en"] * len(ids)),
        "text": pa.array([texts[i] for i in ids]),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    got = {r["doc_id"]: r for r in
           dedup_incremental_batch(spark, str(tmp_path)).collect()}

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    new13 = " ".join([md5(texts[13])] +
                     [md5(texts[13] + f"n{i}") for i in range(2, 6)])
    # batch: 3 verbatim, 8 + suffix, 13's synthetic twice
    assert set(got) == {3 + INC_BATCH_OFFSET, 8 + INC_BATCH_OFFSET,
                        13 + INC_BATCH_OFFSET, 13 + 2 * INC_BATCH_OFFSET}

    r = got[3 + INC_BATCH_OFFSET]
    assert r["disposition"] == "exact_dup_of_index" and r["match_cid"] == 3

    # twin decides near vs new for the suffix-extended doc
    _, bands8 = _minhash_bands_twin(texts[8] + " freshly crawled update note")
    idx_bands = set()
    for i in texts:
        idx_bands |= _minhash_bands_twin(texts[i])[1]
    r = got[8 + INC_BATCH_OFFSET]
    if bands8 & idx_bands:
        assert r["disposition"] == "near_dup_of_index" and r["match_cid"] == 8
        assert r["n_bands_hit"] == len({b for b, _ in bands8 & idx_bands})
    else:
        assert r["disposition"] == "new_unique"

    # synthetic doc: first copy unique (no index collision per the twin),
    # second copy a within-batch dup of the first
    _, bands_new = _minhash_bands_twin(new13)
    assert not (bands_new & idx_bands)
    r1 = got[13 + INC_BATCH_OFFSET]
    assert r1["disposition"] == "new_unique" and r1["match_cid"] is None
    assert r1["n_bands_hit"] == 0
    r2 = got[13 + 2 * INC_BATCH_OFFSET]
    assert r2["disposition"] == "dup_in_batch"
    assert r2["match_cid"] == 13 + INC_BATCH_OFFSET


def test_components_driver_matches_distributed(spark):
    """The small-graph driver union-find and the distributed
    pointer-jumping loop must produce IDENTICAL (cid, component,
    is_canonical) relations — forced onto the same pair set by the
    threshold parameter (0 disables the fast path)."""
    from tank_spark.llm.dedup import lsh_components, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(spark, SF_DIR).select(
        F.col("cid_a"), F.col("cid_b")).localCheckpoint(eager=True)
    fast = {r["cid"]: (r["component"], r["is_canonical"])
            for r in lsh_components(pairs).collect()}
    dist = {r["cid"]: (r["component"], r["is_canonical"])
            for r in lsh_components(pairs, driver_threshold=0).collect()}
    assert fast and fast == dist


def test_quality_pick_prefers_best_member(spark):
    """quality_pick keeps the highest-q member per component, ties fall
    to min cid, and pick_differs flags exactly the components where the
    quality policy disagrees with min-id canonical selection."""
    from tank_spark.llm.dedup import quality_pick

    clusters = spark.createDataFrame(
        [(1, 1), (5, 1), (9, 1), (2, 2), (4, 2)],
        "cid long, component long")
    scored = spark.createDataFrame(
        [(1, 0.2), (5, 0.9), (9, 0.5), (2, 0.3), (4, 0.3)],
        "cid long, q double")
    rows = {r["component"]: r for r in quality_pick(clusters, scored).collect()}
    assert rows[1]["kept_cid"] == 5 and rows[1]["pick_differs"] == 1
    assert rows[1]["n_members"] == 3
    assert rows[1]["kept_q_micro"] == 900000
    assert rows[2]["kept_cid"] == 2 and rows[2]["pick_differs"] == 0


def test_quality_survivors_keep_originals_for_planted_dups(spark):
    """End-to-end at SF_DIR: a planted exact-dup pair (d, d+DUP_OFFSET)
    has IDENTICAL quality (the score lowercases text; length is
    case-invariant), so the tiebreak must keep the original d — and
    min-id/quality policies agree on those pure pairs."""
    from tank_spark.llm.dedup import dedup_quality_survivors

    rows = dedup_quality_survivors(spark, SF_DIR).collect()
    assert rows, "no near-dup components at SF_DIR?"
    pure_pairs = [
        r for r in rows
        if r["n_members"] == 2 and r["component"] < DUP_OFFSET
    ]
    # planted pairs exist and every one keeps the original (cid < offset)
    assert pure_pairs
    for r in pure_pairs:
        assert r["kept_cid"] < DUP_OFFSET


def test_token_freq_spectrum_counter_twin(spark):
    """Pure-Python Counter twin over the same parquet: spectrum counts
    and the hapax row must match exactly."""
    import re
    from collections import Counter

    import pandas as pd

    from tank_spark.llm.text import token_freq_spectrum

    got = {r["freq"]: r for r in token_freq_spectrum(spark, SF_DIR).collect()}
    texts = pd.read_parquet(f"{SF_DIR}/documents.parquet")["text"]
    tf = Counter()
    for t in texts:
        tf.update(re.findall(r"[a-z0-9]+", t.lower()))
    spec = Counter(tf.values())
    assert {f: r["n_types"] for f, r in got.items()} == dict(spec)
    types = sum(spec.values())
    # the synthetic vocabulary is small so no hapax may exist at this
    # SF — check the share math on the rarest frequency class instead.
    # HALF_UP like Spark/DuckDB ROUND (Python round() is banker's).
    fmin = min(spec)
    assert got[fmin]["type_share_ppm"] == int(
        spec[fmin] * 1000000.0 / types + 0.5)

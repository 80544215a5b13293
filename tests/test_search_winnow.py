"""Value-level checks for the round-5 search/fingerprint operators:
winnowing's overlap guarantee, BM25 ranking sanity, containment
asymmetry. (Oracle parity for all of them runs in the full sweep.)"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def _fps(spark, rows):
    from tank_spark.llm.text import winnow_fps

    d = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: set(r["fps"]) for r in winnow_fps(d).collect()}


def test_winnow_shared_run_guarantee(spark):
    """Schleimer guarantee: any shared word run of length >= k + w - 1
    (= 6 here) contributes at least one COMMON selected fingerprint,
    however the run is positioned in either document."""
    run = "alpha beta gamma delta epsilon zeta"  # 6 words = k + w - 1
    fps = _fps(spark, [
        (1, f"xx yy {run} zz"),
        (2, f"{run} aa bb cc dd ee"),
        (3, "totally different words with no overlap here at all"),
    ])
    assert fps[1] & fps[2], "shared 6-word run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_winnow_short_doc_empty(spark):
    fps = _fps(spark, [(1, "one two"), (2, "one two three four five six")])
    assert fps[1] == set()          # shorter than one k-gram window chain
    assert len(fps[2]) >= 1


def test_winnow_selection_is_subset_of_kgram_hashes(spark):
    """Every selected fingerprint is one of the doc's k-gram hashes and
    the density is below 1 (winnowing thins, never invents)."""
    from tank_spark.llm.text import winnow_fps
    from tank_spark.sources.tables import load

    out = winnow_fps(load(spark, SF_DIR, "documents")).collect()
    assert all(0 < len(r["fps"]) <= r["n_kgrams"] for r in out if r["n_kgrams"] > 0)


def test_bm25_rank_sanity(spark):
    """Rank 1..k dense per query; scores non-increasing by rank; every
    returned doc actually contains at least one query term."""
    from tank_spark.llm.search import BM25_QUERIES, BM25_TOPK, bm25_rank_topk
    from tank_spark.sources.tables import load

    out = bm25_rank_topk(spark, SF_DIR).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r)
    assert set(by_q) == {q for q, _ in BM25_QUERIES}
    texts = {r["doc_id"]: r["text"].lower()
             for r in load(spark, SF_DIR, "documents").collect()}
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= BM25_TOPK
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        terms = dict(BM25_QUERIES)[qid].split()
        for r in rows:
            assert any(t in texts[r["doc_id"]].split() for t in terms)


def test_containment_catches_swallowed_doc(spark, tmp_path):
    """A short doc fully contained in a longer one scores containment
    1.0 in its direction even though Jaccard is well below the 0.5
    near-dup bar — the asymmetry this operator exists for."""
    import pandas as pd

    short = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"word{i}" for i in range(40))
    d = tmp_path / "docs"
    d.mkdir()
    pd.DataFrame({
        "doc_id": [1, 3],
        "text": [short, short + " " + filler],
        "lang": ["en", "en"], "source": ["s", "s"],
        "n_chars": [len(short), len(short) + 1 + len(filler)],
    }).to_parquet(d / "documents.parquet")

    from tank_spark.llm.dedup import dedup_containment_pairs, minhash_lsh_pairs

    pairs = dedup_containment_pairs(spark, str(d)).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p["cid_a"], p["cid_b"]) == (1, 3)
    assert p["containment_a"] == pytest.approx(1.0)  # short inside long
    assert p["containment_b"] < 0.5
    # symmetric Jaccard misses the same pair at the 0.5 bar
    assert minhash_lsh_pairs(spark, str(d)).count() == 0


def test_winnow_matches_python_reference(spark):
    """Cross-implementation check: the nested Spark array expression must
    equal a straightforward Python reference implementation of winnowing
    on a deterministic batch of generated word documents (uneven lengths,
    repeated words, boundary sizes 0..k+w+3)."""
    import hashlib
    import random

    from tank_spark.llm.text import WINNOW_K, WINNOW_W, winnow_fps

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(n)))
            for i, n in enumerate(
                list(range(0, WINNOW_K + WINNOW_W + 4)) + [25, 40, 63])]

    def ref(text: str) -> set:
        words = text.split()
        kh = [hashlib.md5(" ".join(words[j:j + WINNOW_K]).encode()).hexdigest()
              for j in range(len(words) - WINNOW_K + 1)]
        return {min(kh[j:j + WINNOW_W])
                for j in range(len(kh) - WINNOW_W + 1)}

    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: set(r["fps"]) for r in winnow_fps(d).collect()}
    for doc_id, text in docs:
        assert got[doc_id] == ref(text), f"doc {doc_id} ({len(text.split())} words)"

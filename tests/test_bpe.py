"""Value-level oracle for BPE training (rows-only for the driver): a
from-scratch Python BPE (Sennrich 2016 semantics) on the same vocabulary
must produce the identical merge sequence, pair counts, and final
tokenizations — the ivf_train_kmeans pinning pattern."""

from __future__ import annotations

import collections

from tests.conftest import SF_DIR


def _ref_bpe(vocab: dict[str, int], n_merges: int, eow: str):
    """Reference implementation: dict word->count, greedy best-pair
    merges with (count DESC, pair ASC) tie-break."""
    toks = {w: list(w) + [eow] for w in vocab}
    merges = []
    for rank in range(n_merges):
        counts: dict[tuple, int] = collections.defaultdict(int)
        for w, cnt in vocab.items():
            t = toks[w]
            for i in range(len(t) - 1):
                counts[(t[i], t[i + 1])] += cnt
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        merges.append((rank, left, right, left + right, cnt))
        for w in toks:
            t, out, i = toks[w], [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == left and t[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            toks[w] = out
    return merges, toks


def test_bpe_merges_match_reference(spark):
    from tank_spark.llm.bpe import END_OF_WORD, N_MERGES, train_bpe, word_vocab

    vocab = {r["word"]: r["cnt"] for r in word_vocab(spark, SF_DIR).collect()}
    assert len(vocab) > 10
    expected, _ = _ref_bpe(vocab, N_MERGES, END_OF_WORD)
    got = [(r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_count"])
           for r in train_bpe(spark, SF_DIR).orderBy("merge_rank").collect()]
    assert got == expected


def test_bpe_tokenize_matches_reference(spark):
    """Applying the learned merges reproduces the reference tokenization
    of every vocabulary word (the encode side)."""
    from pyspark.sql import functions as F

    from tank_spark.llm.bpe import (
        END_OF_WORD, N_MERGES, bpe_tokenize, train_bpe, word_vocab,
    )

    vocab_df = word_vocab(spark, SF_DIR)
    vocab = {r["word"]: r["cnt"] for r in vocab_df.collect()}
    merges_rows = train_bpe(spark, SF_DIR).orderBy("merge_rank").collect()
    merges = [(r["left"], r["right"]) for r in merges_rows]
    _, ref_toks = _ref_bpe(vocab, N_MERGES, END_OF_WORD)

    vt = vocab_df.select(
        "word",
        F.expr(f"concat(split(word, ''), array('{END_OF_WORD}'))").alias("tokens"),
    )
    got = {r["word"]: list(r["tokens"])
           for r in bpe_tokenize(vt, merges).collect()}
    assert got == ref_toks


def test_bpe_greedy_edge_cases(spark):
    """Greedy non-overlapping application on adversarial repeats: the
    fold must merge left-to-right and a merged tail must not re-pair."""
    from pyspark.sql import functions as F

    from tank_spark.llm.bpe import _apply_merge

    df = spark.createDataFrame(
        [(1, ["a", "a", "a"]), (2, ["a", "a", "a", "a"]),
         (3, ["b", "a", "a", "b"]), (4, ["a"]), (5, [])],
        "id int, tokens array<string>",
    )
    out = {r["id"]: list(r["t2"]) for r in df.select(
        "id", _apply_merge("tokens", "a", "a").alias("t2")).collect()}
    assert out[1] == ["aa", "a"]
    assert out[2] == ["aa", "aa"]
    assert out[3] == ["b", "aa", "b"]
    assert out[4] == ["a"]
    assert out[5] == []


def test_bpe_tokenize_corpus_matches_reference(spark):
    """Per-document subword counts must equal summing the reference
    tokenizer's per-word lengths over each document's word stream."""
    import re

    from tank_spark.llm.bpe import (
        END_OF_WORD, N_MERGES, bpe_tokenize_corpus, word_vocab,
    )
    from tests.oracle_util import duckdb_con

    vocab = {r["word"]: r["cnt"] for r in word_vocab(spark, SF_DIR).collect()}
    _, toks = _ref_bpe(vocab, N_MERGES, END_OF_WORD)

    con = duckdb_con(SF_DIR)
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    con.close()
    expected = {}
    for doc_id, text in docs:
        words = re.findall(r"[a-z0-9]+", text.lower())
        if not words:
            continue
        n_bpe = sum(len(toks[w]) for w in words)
        expected[doc_id] = (len(words), n_bpe)

    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_tokenize_corpus(spark, SF_DIR).collect()
    }
    assert got == expected
    for r in bpe_tokenize_corpus(spark, SF_DIR).limit(50).collect():
        # every word yields at least 1 subword, at most len(word)+1 chars
        assert r["n_bpe_tokens"] >= r["n_words"]
        assert r["subwords_per_word"] == r["n_bpe_tokens"] / r["n_words"]

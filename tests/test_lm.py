"""Value-level tests for the in-engine bigram-LM surprisal scorer.

The registered oracle (tests/test_oracle_parity.py sweep) proves
Spark == DuckDB; these tests pin BOTH to an independent pure-Python
reference on a hand-built corpus, so the integer-surprisal formulation
itself (not just cross-engine agreement) is checked.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from tests.conftest import SF_DIR

from tank_spark.llm.lm import HIGH_SURPRISAL_BITS, lm_surprisal_score

DOCS = [
    # repeated boilerplate doc: low surprisal once its bigrams dominate
    (0, "the quick fox the quick fox the quick fox"),
    (1, "the quick fox jumps over a lazy dog"),
    # rare-word doc: every bigram is unique -> high surprisal
    (2, "zeta omega kappa lambda sigma"),
    (3, "single"),           # one token: no bigrams, must drop out
    (4, ""),                 # empty: must drop out
    (5, "??? !!!"),           # no [a-z0-9] tokens at all: must drop out
]


def _reference():
    """Pure-Python twin: add-one bigram LM, integer bit surprisal."""
    toks = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in DOCS}
    vocab = {w for ws in toks.values() for w in ws}
    v = len(vocab)
    c12: Counter = Counter()
    for ws in toks.values():
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] += 1
    c1: Counter = Counter()
    for (a, _), n in c12.items():
        c1[a] += n
    out = {}
    for d, ws in toks.items():
        bgs = list(zip(ws, ws[1:]))
        if not bgs:
            continue
        bits = sum(
            ((c1[a] + v) // (c12[(a, b)] + 1)).bit_length() - 1
            for a, b in bgs
        )
        out[d] = (len(bgs), bits)
    return out


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("lm_corpus")
    rows = [(d, t, "en", "src0", len(t)) for d, t in DOCS]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(p / "documents.parquet"))
    return str(p)


def test_surprisal_matches_python_reference(spark, corpus_dir):
    got = {
        r["doc_id"]: (r["n_bigrams"], r["bits_total"])
        for r in lm_surprisal_score(spark, corpus_dir).collect()
    }
    assert got == _reference()


def test_short_docs_drop_out(spark, corpus_dir):
    ids = {r["doc_id"] for r in lm_surprisal_score(spark, corpus_dir).collect()}
    assert ids.isdisjoint({3, 4, 5})


def test_flag_and_ratio_consistent(spark, corpus_dir):
    for r in lm_surprisal_score(spark, corpus_dir).collect():
        assert r["bits_per_bigram"] == r["bits_total"] / r["n_bigrams"]
        assert r["flag_high_surprisal"] == int(
            r["bits_total"] >= HIGH_SURPRISAL_BITS * r["n_bigrams"]
        )


def test_cross_source_divergence_direction(spark):
    """On the real corpus the matrix must be a divergence: average
    in-domain surprisal (diagonal) strictly below average cross-domain
    surprisal, and every source scores every source (full matrix)."""
    from tank_spark.llm.lm import lm_cross_source_divergence

    rows = lm_cross_source_divergence(spark, SF_DIR).collect()
    srcs = {r["train_source"] for r in rows}
    assert len(rows) == len(srcs) ** 2
    diag = [r["bits_per_bigram"] for r in rows
            if r["train_source"] == r["eval_source"]]
    off = [r["bits_per_bigram"] for r in rows
           if r["train_source"] != r["eval_source"]]
    assert sum(diag) / len(diag) < sum(off) / len(off)


def test_heldout_bits_exceed_in_sample(spark):
    """Generalization check: for the held-out docs, the 98%-train model
    must average MORE surprisal bits than the all-corpus model that saw
    those docs during counting (plus full-matrix shape sanity)."""
    from tank_spark.llm.lm import lm_heldout_surprisal

    held = {r["doc_id"]: r["bits_per_bigram"]
            for r in lm_heldout_surprisal(spark, SF_DIR).collect()}
    assert 0 < len(held) < 50          # the ~2% held-out slice
    self_trained = {
        r["doc_id"]: r["bits_per_bigram"]
        for r in lm_surprisal_score(spark, SF_DIR).collect()
        if r["doc_id"] in held
    }
    assert set(self_trained) == set(held)
    mean_held = sum(held.values()) / len(held)
    mean_self = sum(self_trained.values()) / len(self_trained)
    assert mean_held >= mean_self


def test_boilerplate_scores_below_rare(spark, corpus_dir):
    """The quality signal must point the right way: the repeated-bigram
    doc scores strictly fewer bits/bigram than the all-unique doc."""
    got = {
        r["doc_id"]: r["bits_per_bigram"]
        for r in lm_surprisal_score(spark, corpus_dir).collect()
    }
    assert got[0] < got[2]


def test_dsir_selects_target_like_docs(spark):
    """DSIR semantic pin: the top-quantile cut must (a) select ~20% of
    docs and (b) ENRICH the target source — target-source docs must be
    selected at a strictly higher rate than the rest (they are, by
    construction, the most target-like documents)."""
    from pyspark.sql import functions as F

    from tank_spark.plans.registry import load_all
    from tests.conftest import SF_DIR

    df = load_all()["dsir_importance_weights"].spark(spark, SF_DIR)
    rows = df.select("source", "selected").collect()
    n = len(rows)
    n_sel = sum(r["selected"] for r in rows)
    assert 0.15 * n <= n_sel <= 0.25 * n, f"{n_sel}/{n} selected"
    t = [r["selected"] for r in rows if r["source"] == "src0"]
    o = [r["selected"] for r in rows if r["source"] != "src0"]
    assert t and o
    assert sum(t) / len(t) > sum(o) / len(o), (
        f"target rate {sum(t)/len(t):.3f} <= other rate {sum(o)/len(o):.3f}"
    )


def test_select_top_quantile_matches_window_form(spark):
    """_select_top_quantile must be bit-identical to the global
    PERCENT_RANK window it replaces — including tie groups broken by the
    id column, q edge values, and the n==1 degenerate (Spark defines
    percent_rank of a single row as 0, so nothing is selected)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tank_spark.llm.lm import _select_top_quantile

    data = [(i, float(v)) for i, v in enumerate(
        [5, 3, 3, 3, 9, 1, 7, 7, 2, 8, 0, 4, 4, 6, 6, 6, 6, 10])]
    df = spark.createDataFrame(data, "id long, score double")
    for q in (0.0, 0.2, 0.5, 0.8, 0.9, 1.0):
        got = {r["id"]: r["selected"]
               for r in _select_top_quantile(df, "score", "id", q).collect()}
        w = Window.orderBy("score", "id")
        want = {r["id"]: r["selected"] for r in df.withColumn(
            "selected", (F.percent_rank().over(w) >= q).cast("int")).collect()}
        assert got == want, f"q={q}: {got} != {want}"
    one = spark.createDataFrame([(1, 2.0)], "id long, score double")
    got1 = _select_top_quantile(one, "score", "id", 0.8).collect()
    assert got1[0]["selected"] == 0


def test_select_top_quantile_rejects_null_scores(spark):
    """NULL order values must fail fast with a clear error (ADVICE r7):
    silently marking them selected=0 diverges from the NULLS-FIRST
    ranking of the PERCENT_RANK window form the helpers claim
    bit-identity with, and an all-NULL group crashed the grouped helper
    with TypeError(float(None))."""
    import pytest

    from tank_spark.llm.lm import (
        _select_top_quantile, _select_top_quantile_grouped)

    df = spark.createDataFrame(
        [(0, 1.0), (1, None), (2, 3.0)], "id long, score double")
    with pytest.raises(ValueError, match="NULL 'score'"):
        _select_top_quantile(df, "score", "id", 0.5).collect()

    gdf = spark.createDataFrame(
        [(0, "a", 1.0), (1, "b", None), (2, "b", None)],
        "id long, g string, score double")
    with pytest.raises(ValueError, match="NULL 'score'"):
        _select_top_quantile_grouped(gdf, "score", "id", "g", 0.5).collect()


def test_select_top_quantile_grouped_matches_keyed_window(spark):
    """The grouped form must be bit-identical to PERCENT_RANK() OVER
    (PARTITION BY g ORDER BY score, id) — across groups with ties, a
    singleton group (percent_rank 0 -> never selected at q>0), and
    uneven group sizes."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tank_spark.llm.lm import _select_top_quantile_grouped

    data = []
    vals = {"a": [5, 3, 3, 9, 1, 7, 7, 2, 8, 0, 4],
            "b": [2, 2, 2, 2, 11, 12],
            "c": [42]}
    i = 0
    for g, vs in vals.items():
        for v in vs:
            data.append((i, g, float(v))); i += 1
    df = spark.createDataFrame(data, "id long, g string, score double")
    for q in (0.0, 0.2, 0.5, 0.8, 1.0):
        got = {r["id"]: r["selected"] for r in
               _select_top_quantile_grouped(df, "score", "id", "g", q).collect()}
        w = Window.partitionBy("g").orderBy("score", "id")
        want = {r["id"]: r["selected"] for r in df.withColumn(
            "selected", (F.percent_rank().over(w) >= q).cast("int")).collect()}
        assert got == want, f"q={q}"


def _missed_first_bracket(lm, calls):
    """percentile_approx stand-in whose FIRST call returns a bracket far
    below any high-q cut (quantiles [0, 0.01]) so the verification count
    must reject it; later calls delegate to the real function."""
    real = lm.F.percentile_approx

    def fake(col, percentages, accuracy):
        calls.append(1)
        if len(calls) == 1:
            return real(
                col, lm.F.array(lm.F.lit(0.0), lm.F.lit(0.01)), accuracy)
        return real(col, percentages, accuracy)

    return fake


def test_select_top_quantile_widens_missed_bracket(spark, monkeypatch):
    """A missed approx bracket must WIDEN and re-bracket, not fall back
    to a single-task sort of the whole relation (VERDICT r7: at 100 TB
    the old full-relation fallback meant one task sorting the corpus).
    Forced by stubbing the first percentile_approx call to return a
    bracket that cannot contain the q=0.9 cut; the helper must retry
    (>= 2 bracket calls) and still match the window form exactly."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import tank_spark.llm.lm as lm

    calls: list[int] = []
    monkeypatch.setattr(
        lm.F, "percentile_approx", _missed_first_bracket(lm, calls))
    data = [(i, float(v)) for i, v in enumerate(
        [5, 3, 3, 3, 9, 1, 7, 7, 2, 8, 0, 4, 4, 6, 6, 6, 6, 10])]
    df = spark.createDataFrame(data, "id long, score double")
    got = {r["id"]: r["selected"]
           for r in lm._select_top_quantile(df, "score", "id", 0.9).collect()}
    assert len(calls) >= 2, "missed bracket did not trigger a retry"
    w = Window.orderBy("score", "id")
    want = {r["id"]: r["selected"] for r in df.withColumn(
        "selected", (F.percent_rank().over(w) >= 0.9).cast("int")).collect()}
    assert got == want


def test_select_top_quantile_grouped_widens_missed_bracket(spark, monkeypatch):
    """Grouped form of the widening contract: only the missed groups are
    re-bracketed (batched), and the final selection still matches the
    keyed PERCENT_RANK window bit-for-bit."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import tank_spark.llm.lm as lm

    calls: list[int] = []
    monkeypatch.setattr(
        lm.F, "percentile_approx", _missed_first_bracket(lm, calls))
    data = []
    vals = {"a": [5, 3, 3, 9, 1, 7, 7, 2, 8, 0, 4], "b": [2, 2, 2, 2, 11, 12]}
    i = 0
    for g, vs in vals.items():
        for v in vs:
            data.append((i, g, float(v))); i += 1
    df = spark.createDataFrame(data, "id long, g string, score double")
    got = {r["id"]: r["selected"] for r in lm._select_top_quantile_grouped(
        df, "score", "id", "g", 0.9).collect()}
    assert len(calls) >= 2, "missed bracket did not trigger a retry"
    w = Window.partitionBy("g").orderBy("score", "id")
    want = {r["id"]: r["selected"] for r in df.withColumn(
        "selected", (F.percent_rank().over(w) >= 0.9).cast("int")).collect()}
    assert got == want


def test_rank_cut_pairs_match_window_quartiles(spark):
    """_rank_cut_pairs must reproduce the global PERCENT_RANK window's
    quantile BUCKETS bit-for-bit (the multi-cut generalization of the
    _select_top_quantile contract): stage = number of cuts passed equals
    the window form's quartile index for tie-heavy data, and the n==1
    degenerate yields stage 0 (percent_rank of a single row is 0)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tank_spark.llm.lm import _rank_cut_pairs

    data = [(i, float(v)) for i, v in enumerate(
        [5, 3, 3, 3, 9, 1, 7, 7, 2, 8, 0, 4, 4, 6, 6, 6, 6, 10, 3, 3])]
    df = spark.createDataFrame(data, "id long, score double")
    qs = (0.25, 0.5, 0.75)
    scored, cuts = _rank_cut_pairs(df, "score", "id", qs)
    stage = F.lit(0)
    for q in qs:
        v, i = cuts[q]
        stage = stage + (
            (F.col("score") > F.lit(v))
            | ((F.col("score") == F.lit(v)) & (F.col("id") >= F.lit(i)))
        ).cast("int")
    got = {r["id"]: r["stage"]
           for r in scored.select("id", stage.alias("stage")).collect()}
    pr = F.percent_rank().over(Window.orderBy("score", "id"))
    want = {r["id"]: r["stage"] for r in df.withColumn(
        "stage",
        (pr >= 0.25).cast("int") + (pr >= 0.5).cast("int")
        + (pr >= 0.75).cast("int")).collect()}
    assert got == want

    one = spark.createDataFrame([(7, 4.0)], "id long, score double")
    _, cuts1 = _rank_cut_pairs(one, "score", "id", qs)
    assert all(cuts1[q] is None for q in qs)


def test_rank_cut_pairs_rejects_null_scores(spark):
    """Same NULL-score contract as the single/grouped helpers."""
    import pytest

    from tank_spark.llm.lm import _rank_cut_pairs

    df = spark.createDataFrame(
        [(0, 1.0), (1, None), (2, 3.0)], "id long, score double")
    with pytest.raises(ValueError, match="NULL 'score'"):
        _rank_cut_pairs(df, "score", "id", (0.5,))


def test_rank_cut_pairs_widens_missed_bracket(spark, monkeypatch):
    """A missed approx bracket widens and re-brackets ONLY the missed
    cuts (batched), never falling back to a full-relation sort — and the
    final buckets still match the window form."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import tank_spark.llm.lm as lm

    calls: list[int] = []
    real = lm.F.percentile_approx

    def fake(col, percentages, accuracy):
        # arity-aware variant of _missed_first_bracket: the multi-cut
        # helper asks for 2*len(qs) bounds in ONE call, so the first
        # (sabotaged) call must return four values, all squeezed into a
        # bracket no high cut can live in
        calls.append(1)
        if len(calls) == 1:
            return real(col, lm.F.array(*[
                lm.F.lit(v) for v in (0.0, 0.01, 0.0, 0.01)]), accuracy)
        return real(col, percentages, accuracy)

    monkeypatch.setattr(lm.F, "percentile_approx", fake)
    data = [(i, float(v)) for i, v in enumerate(
        [5, 3, 3, 3, 9, 1, 7, 7, 2, 8, 0, 4, 4, 6, 6, 6, 6, 10])]
    df = spark.createDataFrame(data, "id long, score double")
    scored, cuts = lm._rank_cut_pairs(df, "score", "id", (0.5, 0.9))
    assert len(calls) >= 2, "missed bracket did not trigger a retry"
    for q in (0.5, 0.9):
        v, i = cuts[q]
        got = {r["id"]: r["sel"] for r in scored.select(
            "id", ((F.col("score") > F.lit(v))
                   | ((F.col("score") == F.lit(v))
                      & (F.col("id") >= F.lit(i)))).cast("int").alias("sel")
        ).collect()}
        w = Window.orderBy("score", "id")
        want = {r["id"]: r["sel"] for r in df.withColumn(
            "sel", (F.percent_rank().over(w) >= q).cast("int")).collect()}
        assert got == want, f"q={q}"


def test_curriculum_stages_balanced_and_keyed(spark):
    """At SF_DIR every quartile stage is populated (non-vacuous), sizes
    are within quartile bounds (ties can only GROW a value-bucket), and
    shuffle_key is deterministic across invocations."""
    from tank_spark.llm.lm import curriculum_quality_stages

    rows = curriculum_quality_stages(spark, SF_DIR).collect()
    by_stage: dict[int, int] = {}
    for r in rows:
        by_stage[r["stage"]] = by_stage.get(r["stage"], 0) + 1
    assert set(by_stage) == {0, 1, 2, 3}
    n = len(rows)
    assert all(c >= n // 8 for c in by_stage.values()), by_stage
    again = {r["doc_id"]: r["shuffle_key"]
             for r in curriculum_quality_stages(spark, SF_DIR).collect()}
    assert {r["doc_id"]: r["shuffle_key"] for r in rows} == again


import pytest as _pytest


@_pytest.mark.parametrize("vals", [
    [4.0] * 12,                                    # all-equal: band = whole relation
    [1.0] * 9 + [2.0] * 3,                         # two-value mass straddling cuts
    [float(i) for i in range(16)],                 # strictly monotone, no ties
    [0.0] * 15 + [100.0],                          # single outlier at the top
    [-5.0, -5.0, -5.0, 0.0, 0.0, 7.5],             # negatives + ties, tiny n
])
@_pytest.mark.parametrize("qs", [(0.0, 1.0), (0.25, 0.5, 0.75), (0.9,)])
def test_rank_cut_pairs_pathological_distributions(spark, vals, qs):
    """The multi-cut helper must stay bit-identical to the window form on
    the distributions that break approx-quantile recipes: total tie mass
    (the bracket degenerates to the whole relation — correct, documented
    as no longer cheap), step functions straddling a cut, and q edge
    values 0/1 (percent_rank >= 0 selects everything; >= 1 only the max
    pair)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tank_spark.llm.lm import _rank_cut_pairs

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, score double")
    scored, cuts = _rank_cut_pairs(df, "score", "id", qs)
    for q in qs:
        pair = cuts[q]
        if pair is None:
            sel = F.lit(0)
        else:
            v, i = pair
            sel = ((F.col("score") > F.lit(v))
                   | ((F.col("score") == F.lit(v))
                      & (F.col("id") >= F.lit(i)))).cast("int")
        got = {r["id"]: r["s"]
               for r in scored.select("id", sel.alias("s")).collect()}
        w = Window.orderBy("score", "id")
        want = {r["id"]: r["s"] for r in df.withColumn(
            "s", (F.percent_rank().over(w) >= q).cast("int")).collect()}
        assert got == want, f"vals={vals} q={q}"

"""Hybrid RRF retrieval (llm/search.py hybrid_search_rrf): staged
parity obligation, fusion arithmetic, and the bounded two-tower plan."""

from __future__ import annotations

from tests.conftest import SF_DIR
from tests.oracle_util import compare

DRIVER_SF = "/root/testdata/sf0.01"


def test_staged_parity_at_driver_sf(spark):
    for sf_dir in (SF_DIR, DRIVER_SF):
        compare(spark, sf_dir, "hybrid_search_rrf")


def test_rrf_arithmetic_and_shape(spark):
    """Every emitted rrf equals the fixed-point sum of its two sides'
    1/(K+rank) terms (recomputed independently here), each query emits
    exactly TOPK rows, and both towers contribute rows — the fusion is
    non-vacuous in both directions."""
    from tank_spark.llm.search import (
        HYBRID_QVECS,
        HYBRID_TOPK,
        RRF_K,
        _SCALE,
        hybrid_search_rrf,
    )

    rows = hybrid_search_rrf(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
        want = 0
        for side in ("lex_rank", "sem_rank"):
            if r[side] is not None:
                assert 1 <= r[side] <= HYBRID_TOPK
                want += round(_SCALE / (RRF_K + r[side]))
        assert round(r["rrf"] * _SCALE) == want
    assert set(by_q) == {q for q, _ in HYBRID_QVECS}
    for q, rs in by_q.items():
        assert len(rs) == HYBRID_TOPK
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, HYBRID_TOPK + 1))
        # rrf non-increasing in rank (the fusion order is real)
        ordered = sorted(rs, key=lambda r: r["rank"])
        assert all(a["rrf"] >= b["rrf"]
                   for a, b in zip(ordered, ordered[1:]))
    assert any(r["lex_rank"] is not None for r in rows)
    assert any(r["sem_rank"] is not None for r in rows)


def test_overlap_doc_outranks_single_tower(spark):
    """The RRF point: a document on BOTH lists beats a same-rank
    single-tower document. The synthetic corpus has no natural
    overlap, so fuse two constructed rank lists through the same
    fixed-point arithmetic and assert the ordering property the
    registered entry's plan implements."""
    from tank_spark.llm.search import RRF_K, _SCALE

    both = round(_SCALE / (RRF_K + 3)) + round(_SCALE / (RRF_K + 3))
    single_best = round(_SCALE / (RRF_K + 1))
    assert both > single_best  # rank-3 on both towers > rank-1 on one


def test_two_tower_plan_is_bounded(spark):
    """Semantic side: query vectors broadcast (the knn convention).
    The ONE SortMergeJoin allowed is the FullOuter fusion itself —
    Spark cannot broadcast a full outer join, and both its inputs are
    top-K-bounded (K rows per query), so it never scales with the
    corpus; every corpus-sized join must be broadcast."""
    from tank_spark.llm.search import hybrid_search_rrf

    plan = (hybrid_search_rrf(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    smj = [l for l in plan.splitlines() if "SortMergeJoin" in l]
    assert len(smj) == 1 and "FullOuter" in smj[0]
    assert "BroadcastNestedLoopJoin" in plan  # the broadcast query side
    assert "CartesianProduct" not in plan

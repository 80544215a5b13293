"""The trained IVF quantizer arc (VERDICT r10 #2): ivf_train_kmeans's
centroids, frozen as literals (llm/ivf_frozen.py via
tools/freeze_ivf_centroids.py), wired into the probe/recall serving
path. Oracle parity for ivf_trained_probe_search /
ivf_trained_recall_eval is covered by the auto-parameterized
test_oracle_parity; this file pins (a) the recall WIN that justifies
training — measured with centroids trained in-session on the current
data, so the assertion survives driver testdata regeneration — and
(b) the frozen module's contract + plan identity with the raw path."""

from __future__ import annotations

import math

from tests.conftest import SF_DIR

TRAIN_SF = "/root/testdata/sf0.01"  # the SF the frozen snapshot trains on


def _plan_skeleton(df) -> list[str]:
    """Physical operator names in plan order, literals stripped — the
    plan-identity pin both probe tests share."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    ops = []
    for line in plan.splitlines():
        s = line.lstrip(" *+-:")
        if not s or s.startswith("("):
            continue
        ops.append(s.split("(")[0].split("[")[0].strip())
    return [o for o in ops if o]


def test_frozen_centroids_contract():
    """k x DIM finite doubles, ids sorted and dense — the shape every
    consumer (Spark literal builder + DuckDB VALUES CTE) assumes."""
    from tank_spark.llm.ivf_frozen import (
        FROZEN_CENTROIDS,
        FROZEN_K,
        FROZEN_TRAIN_SF,
    )
    from tank_spark.llm.similarity import DIM

    assert len(FROZEN_CENTROIDS) == FROZEN_K
    assert [cid for cid, _ in FROZEN_CENTROIDS] == list(range(FROZEN_K))
    for _, emb in FROZEN_CENTROIDS:
        assert len(emb) == DIM
        assert all(isinstance(v, float) and math.isfinite(v) for v in emb)
    assert FROZEN_TRAIN_SF.rstrip("/").endswith("sf0.01")


def test_trained_recall_beats_raw_at_training_sf(spark):
    """The point of paying for k-means: a quantizer trained ON the data
    must recall at least as well as the arbitrary vec_id<8 raw
    quantizer at the same nprobe (it strictly wins on the current
    fixture: 1.000 vs 0.833 mean). Trains in-session so the assertion
    tracks the CURRENT testdata rather than the frozen snapshot."""
    import statistics

    from tank_spark.llm.similarity import (
        _probe_core,
        _recall_core,
        _score_structs_from_rows,
        ivf_recall_eval,
        train_kmeans,
    )

    rows = sorted(
        (int(r["centroid_id"]), [float(v) for v in r["c_emb"]])
        for r in train_kmeans(spark, TRAIN_SF, k=8, rounds=4).collect()
    )
    arr = _score_structs_from_rows(
        rows, ("test-trained", spark.sparkContext.applicationId, TRAIN_SF),
        ())
    pred = _probe_core(spark, TRAIN_SF, arr)
    trained = {r["qid"]: (r["recall"], r["scan_frac"])
               for r in _recall_core(spark, TRAIN_SF, arr, pred).collect()}
    raw = {r["qid"]: (r["recall"], r["scan_frac"])
           for r in ivf_recall_eval(spark, TRAIN_SF).collect()}
    assert trained.keys() == raw.keys()
    t_mean = statistics.mean(v[0] for v in trained.values())
    r_mean = statistics.mean(v[0] for v in raw.values())
    assert t_mean >= r_mean, (trained, raw)
    # the win can't come from degenerate lists that scan everything
    assert all(v[1] < 0.5 for v in trained.values()), trained


def test_trained_probe_plan_identical_to_raw(spark):
    """ivf_trained_probe_search claims 'same map-only literal-quantizer
    plan as ivf_probe_search' — pin it: the physical operator skeletons
    must be IDENTICAL (only the quantizer literals differ), so the
    trained path inherits every plan property the raw path's shape
    tests pin (assignment join-free, query side broadcast)."""
    from tank_spark.llm.similarity import (
        ivf_probe_search,
        ivf_trained_probe_search,
    )

    raw = _plan_skeleton(ivf_probe_search(spark, SF_DIR))
    trained = _plan_skeleton(ivf_trained_probe_search(spark, SF_DIR))
    assert trained == raw
    assert any("BroadcastHashJoin" in o for o in trained)


def test_frozen2_contract():
    """The two-level artifact: k fine centroids densely numbered,
    n_coarse group means, a total non-overlapping grouping — the shape
    both the Spark nested literal and the DuckDB fcent CTE assume."""
    import math

    from tank_spark.llm.ivf_frozen2 import (
        FROZEN2_CENTROIDS,
        FROZEN2_COARSE,
        FROZEN2_GROUPS,
        FROZEN2_K,
        FROZEN2_NCOARSE,
    )
    from tank_spark.llm.similarity import DIM

    assert len(FROZEN2_CENTROIDS) == FROZEN2_K
    assert [cid for cid, _ in FROZEN2_CENTROIDS] == list(range(FROZEN2_K))
    assert len(FROZEN2_COARSE) == FROZEN2_NCOARSE
    assert len(FROZEN2_GROUPS) == FROZEN2_NCOARSE
    members = [cid for grp in FROZEN2_GROUPS for cid in grp]
    assert sorted(members) == list(range(FROZEN2_K))  # total, disjoint
    assert all(grp for grp in FROZEN2_GROUPS)  # no empty literal arrays
    for _, emb in FROZEN2_CENTROIDS + FROZEN2_COARSE:
        assert len(emb) == DIM
        assert all(math.isfinite(v) for v in emb)


def test_twolevel_assignment_is_map_only(spark):
    """The docstring claim: two-level routed assignment is a PROJECTION
    (coarse literal argmin -> element_at -> fine literal argmin) — no
    join, no window, and the only query-side exchange feeds the 64-row
    inventory groupBy (partial-aggregated)."""
    from tank_spark.llm.similarity import ivf_twolevel_assignments

    plan = (ivf_twolevel_assignments(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan
    assert "Join" not in plan
    query_part = plan.split("InMemoryRelation")[0]
    assert query_part.count("Exchange") <= 1
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_twolevel_probe_stays_broadcast(spark):
    """ivf_twolevel_probe_search's claims: routing/probe ranking are
    literal-array expressions (no extra joins beyond the shared
    candidate tail) and the query side broadcasts — the plan skeleton
    must match the flat probe's exactly (same _probe_rank_tail, same
    join count; only the projection expressions differ)."""
    from tank_spark.llm.similarity import (
        ivf_probe_search,
        ivf_twolevel_probe_search,
    )

    flat = _plan_skeleton(ivf_probe_search(spark, SF_DIR))
    two = _plan_skeleton(ivf_twolevel_probe_search(spark, SF_DIR))
    assert two == flat
    assert any("BroadcastHashJoin" in o for o in two)


def test_twolevel_recall_plan_identical_to_raw(spark):
    """ivf_twolevel_recall_eval reuses the probe search's own assignment
    column and probe fan-out through the shared _recall_tail — pin that
    its physical skeleton is IDENTICAL to ivf_recall_eval's (only the
    quantizer literals differ), so the two-level eval inherits every
    plan property the raw eval carries (broadcast query side, bounded
    candidate fan-out, no extra joins)."""
    from tank_spark.llm.similarity import (
        ivf_recall_eval,
        ivf_twolevel_recall_eval,
    )

    raw = _plan_skeleton(ivf_recall_eval(spark, SF_DIR))
    two = _plan_skeleton(ivf_twolevel_recall_eval(spark, SF_DIR))
    assert two == raw
    assert any("BroadcastHashJoin" in o for o in two)


def test_twolevel_recall_census_matches_probe_fanout(spark):
    """The eval's n_candidates census must count exactly the rows the
    probe search ranks: for every query, n_candidates equals the
    candidate count implied by re-running the probe fan-out (probed
    lists joined to the assignment, minus self) — the property that
    makes scan_frac an honest cost number for THIS serving path."""
    import pyspark.sql.functions as F
    from tank_spark.llm.similarity import (
        _frozen2_assign_col,
        _frozen2_probes_df,
        ivf_twolevel_recall_eval,
    )
    from tank_spark.sources.tables import load

    e = load(spark, SF_DIR, "embeddings")
    assign = e.select(
        "vec_id", _frozen2_assign_col(spark).alias("centroid_id"))
    fanout = {
        r["qid"]: r["n"]
        for r in _frozen2_probes_df(spark, e)
        .join(assign, "centroid_id")
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    evald = {r["qid"]: r["n_candidates"]
             for r in ivf_twolevel_recall_eval(spark, SF_DIR).collect()}
    assert evald == {qid: fanout.get(qid, 0) for qid in evald}


def test_frozen_score_structs_memoized(spark):
    """Repeated plan builds in one session reuse the parsed quantizer
    Column (the r10 plan-build-cost lesson applies to the frozen path
    too)."""
    from tank_spark.llm.similarity import _frozen_score_structs

    assert _frozen_score_structs(spark) is _frozen_score_structs(spark)


def test_probe4_staged_parity_at_driver_sf(spark):
    """ivf_twolevel_probe4_recall_eval's staged obligation (registered
    after the frozen r12 window; r14 flex slot pre-assigned): full
    oracle parity at the DRIVER_SF (sf0.01) AND the pytest SF."""
    from tests.oracle_util import compare

    DRIVER_SF = "/root/testdata/sf0.01"
    for sf_dir in (SF_DIR, DRIVER_SF):
        compare(spark, sf_dir, "ivf_twolevel_probe4_recall_eval")


def test_probe4_is_the_production_point(spark):
    """The registered operating point must keep earning its doc claim
    on CURRENT data: at (W_COARSE, nprobe=4) the two-level recall is at
    least the flat-trained k=8 reference's while scanning strictly
    less — measured at the training SF, quantizer content aside the
    plan is the default eval's (skeleton pinned below)."""
    import pyspark.sql.functions as F
    from tank_spark.llm.similarity import (
        ivf_trained_recall_eval,
        ivf_twolevel_probe4_recall_eval,
        ivf_twolevel_recall_eval,
    )

    def means(df):
        r = df.agg(F.avg("recall"), F.avg("scan_frac")).first()
        return float(r[0]), float(r[1])

    flat_rec, flat_scan = means(ivf_trained_recall_eval(spark, TRAIN_SF))
    p2_rec, _ = means(ivf_twolevel_recall_eval(spark, TRAIN_SF))
    p4_rec, p4_scan = means(
        ivf_twolevel_probe4_recall_eval(spark, TRAIN_SF))
    assert p4_rec >= flat_rec          # recall recovered to the flat bar
    assert p4_rec >= p2_rec            # never worse than the default dial
    assert p4_scan < flat_scan         # at strictly less scan


def test_probe4_plan_identical_to_default_dial(spark):
    """nprobe only widens the candidate join — the production point's
    physical skeleton must be IDENTICAL to the default two-level
    eval's (no new exchange, no new join appears at nprobe=4)."""
    from tank_spark.llm.similarity import (
        ivf_twolevel_probe4_recall_eval,
        ivf_twolevel_recall_eval,
    )

    assert _plan_skeleton(ivf_twolevel_probe4_recall_eval(spark, SF_DIR)) \
        == _plan_skeleton(ivf_twolevel_recall_eval(spark, SF_DIR))

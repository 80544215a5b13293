"""Docstring-claims audit as code (round 9).

The semdedup_prune incident: its registration doc claimed the hot-bucket
cap "pattern" while the code ran an uncapped quadratic join — a claim
nothing executable ever checked. This module pins every UNPINNED
scale claim made by a registration docstring ("map-only", "no shuffle",
"broadcast") to the executed physical plan, so a claim that stops being
true fails a test instead of surviving as prose. Queries whose claims
are already pinned by test_plan_shapes.py are not duplicated here.

Property meanings:
- ``map_only``: no hash/range-partitioning Exchange in the query part
  (the cached source relation's one-time build plan below
  InMemoryRelation legitimately repartitions). A SinglePartition
  exchange feeding a 1-row final aggregate is allowed where noted —
  that is a reduction, not a data shuffle.
- ``no_smj``: every join resolved as a broadcast join — no
  SortMergeJoin and no CartesianProduct anywhere in the plan. (A
  BroadcastNestedLoopJoin of a broadcast 1-row scalar is the accepted
  corpus-constant pattern and is not excluded.)
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _query_part(plan: str) -> str:
    return plan.split("InMemoryRelation")[0]


# query -> (map_only, single_partition_ok, no_smj)
CLAIMS: dict[str, dict] = {
    # pure projections / Arrow-batched kernels: zero exchanges
    "media_frame_sample": {"map_only": True},
    "media_resize": {"map_only": True},
    "video_keyframes": {"map_only": True},
    "video_scene_cuts": {"map_only": True},
    "train_eval_split": {"map_only": True},
    "gopher_quality_rules": {"map_only": True},
    "pii_detect_mask": {"map_only": True},
    "text_stats": {"map_only": True},
    "embedding_norms": {"map_only": True},
    # map-only scoring + one 1-row reduction
    "quality_lr_eval": {"map_only": True, "single_ok": True},
    # broadcast-claims: no sort-merge join, no cartesian product
    "rare_word_fraction": {"no_smj": True},
    "token_freq_spectrum": {"no_smj": True},
    "semantic_vs_lexical": {"no_smj": True},
    "temperature_mix_weights": {"no_smj": True},
    "pq_adc_topk": {"no_smj": True},
    "tile_sample_overview": {"no_smj": True},
    "nation_trade_balance": {"no_smj": True},
    "q3_shipping_priority": {"no_smj": True},
    "token_budget_planning": {"no_smj": True},
    # capped semdedup: rep selection + pair join broadcast (>=2 BHJ);
    # the one SMJ allowed is the skinny verdict-labeling join (see its
    # docstring) — so only CartesianProduct is excluded
    "semdedup_prune_capped": {"no_cartesian": True, "min_bhj": 2},
}


@pytest.mark.parametrize("name", sorted(CLAIMS))
def test_plan_matches_docstring_claim(spark, name):
    from tank_spark.plans.registry import load_all

    props = CLAIMS[name]
    plan = _plan(load_all()[name].spark(spark, SF_DIR))
    q = _query_part(plan)
    if props.get("map_only"):
        assert "Exchange hashpartitioning" not in q, f"{name}: shuffle in map-only plan"
        assert "Exchange rangepartitioning" not in q, f"{name}: sort in map-only plan"
        if not props.get("single_ok"):
            assert "Exchange SinglePartition" not in q, f"{name}: unexpected reduction"
    if props.get("no_smj"):
        assert "SortMergeJoin" not in plan, f"{name}: SortMergeJoin in broadcast-claimed plan"
        assert "CartesianProduct" not in plan, f"{name}: CartesianProduct"
    if props.get("no_cartesian"):
        assert "CartesianProduct" not in plan, f"{name}: CartesianProduct"
    if props.get("min_bhj"):
        assert plan.count("BroadcastHashJoin") >= props["min_bhj"], (
            f"{name}: expected >= {props['min_bhj']} broadcast joins")

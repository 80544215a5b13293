"""Driver-shaped oracle parity for every SQL-expressible registered query.

This is the local twin of the driver's CORRECTNESS gate: each query runs in
Spark AND DuckDB at sf0.001 and must match on columns, row count, and
sorted values.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from tests.oracle_util import compare


def _oracle_query_names():
    from tank_spark.plans.registry import load_all

    return [name for name, q in load_all().items() if q.oracle is not None]


@pytest.mark.parametrize("name", _oracle_query_names())
def test_oracle_parity(spark, name):
    compare(spark, SF_DIR, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_queries_oracle_keys_align():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0


def test_registered_builders_take_spark_and_sf_dir():
    """Every registered builder must be callable as (spark, sf_dir) —
    catches decorator misbinding (a helper def slipped between @register
    and its intended function inherits the registration; happened once
    with a 3-arg LUT helper, which only failed at call time)."""
    import inspect

    from tank_spark.plans.registry import load_all

    for name, q in load_all().items():
        sig = inspect.signature(q.spark)
        required = [
            p for p in sig.parameters.values()
            if p.default is inspect.Parameter.empty
            and p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
        ]
        assert len(required) == 2, (
            f"{name}: builder {q.spark.__name__} requires "
            f"{[p.name for p in required]} — not (spark, sf_dir)"
        )


def test_array_agg_statuses_raw(spark):
    """Raw complex-type output (true array column) — the registered query
    compares a string-joined projection because the driver's canonicalizer
    can't hash list cells."""
    from tank_spark.operators.advanced import array_agg_statuses_raw

    rows = {r["l_returnflag"]: r for r in array_agg_statuses_raw(spark, SF_DIR).collect()}
    assert set(rows) == {"A", "N", "R"}
    for r in rows.values():
        assert r["statuses"] == sorted(r["statuses"])  # sort_array applied
        assert r["n_statuses"] == len(r["statuses"])
        assert r["has_open"] == (1 if "O" in r["statuses"] else 0)


def test_tile_planner_edge_inputs():
    """Planner guards: out-of-domain tiles raise cleanly; boundary zooms
    produce valid ranges."""
    import pytest

    from tank_spark.operators.tiles import tile_hash_range

    from tank_spark.geom import morton

    lo, hi = tile_hash_range(0, 0, 0)       # whole world: full 26-bit range
    assert lo == 0 and hi == morton.interleave(8191, 8191) == 4**13 - 1
    lo, hi = tile_hash_range(13, 8191, 8191)  # last bucket
    assert lo == hi == morton.interleave(8191, 8191)
    lo, hi = tile_hash_range(15, 0, 0)      # z>13: parent bucket
    assert lo == hi == 0
    with pytest.raises(ValueError):
        tile_hash_range(13, 8192, 0)        # x out of 13-bit tile domain

"""Behavioral guarantees of the engine-exact sketch operators — the
oracle sweep proves Spark == DuckDB; these pin the SKETCH PROPERTIES
(one-sidedness, measured error) against independent recomputation."""

from __future__ import annotations

import re

from tests.conftest import SF_DIR
from tests.oracle_util import duckdb_con

from tank_spark.llm.sketches import (
    SHINGLE_W, bloom_decontaminate, cms_heavy_hitters,
)
from tank_spark.llm.mixing import SPLIT_SALT, SPLIT_TRAIN_PCT


def _exact_flagged():
    """Independent Python recomputation of the exact contamination set."""
    import hashlib

    con = duckdb_con(SF_DIR)
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    con.close()

    def is_train(doc_id: int) -> bool:
        h8 = hashlib.md5(f"{SPLIT_SALT}{doc_id}".encode()).hexdigest()[:8]
        return int(h8, 16) % 100 < SPLIT_TRAIN_PCT

    def shingles(text: str) -> set:
        ws = re.findall(r"[a-z0-9]+", text.lower())
        return {
            " ".join(ws[i:i + SHINGLE_W])
            for i in range(len(ws) - SHINGLE_W + 1)
        }

    eval_sh = set()
    for doc_id, text in docs:
        if not is_train(doc_id):
            eval_sh |= shingles(text)
    return {
        doc_id for doc_id, text in docs
        if is_train(doc_id) and shingles(text) & eval_sh
    }


def test_bloom_one_sided_and_exact_subset(spark):
    rows = bloom_decontaminate(spark, SF_DIR).collect()
    assert rows, "bloom flagged nothing — vacuous configuration"
    # emitted rows are exactly the bloom-positive docs, and the exact
    # flag inside them reproduces the true contamination set (no false
    # negatives possible: exact hit => all k positions set => bloom hit)
    got_exact = {r["doc_id"] for r in rows if r["flag_exact"] == 1}
    assert got_exact == _exact_flagged()
    assert all(r["flag_bloom"] == 1 for r in rows)


def test_cms_overestimates_never_under(spark):
    rows = cms_heavy_hitters(spark, SF_DIR).collect()
    assert len(rows) == 20
    assert all(r["overestimate"] >= 0 for r in rows)
    assert all(r["cms_est"] == r["exact_n"] + r["overestimate"] for r in rows)
    # the deliberately under-provisioned width must show REAL error
    assert any(r["overestimate"] > 0 for r in rows)


def test_hll_estimates_within_linear_counting_error(spark):
    """m=64 linear counting is ~5-10% accurate in the small range; the
    corrected estimate must beat the raw estimator and land within a
    conservative 25% of exact for every source."""
    from tank_spark.llm.sketches import hll_cardinality_by_source

    rows = hll_cardinality_by_source(spark, SF_DIR).collect()
    assert len(rows) >= 2
    for r in rows:
        assert 1 <= r["regs_used"] <= 64
        rel = abs(r["hll_est"] - r["exact_n"]) / r["exact_n"]
        assert rel <= 0.25, (r["source"], r["hll_est"], r["exact_n"])
    mean_corr = sum(abs(r["hll_est"] - r["exact_n"]) / r["exact_n"]
                    for r in rows) / len(rows)
    mean_raw = sum(abs(r["hll_raw_est"] - r["exact_n"]) / r["exact_n"]
                   for r in rows) / len(rows)
    assert mean_corr < mean_raw


def test_approx_sketches_demo_bounds(spark):
    """Value-level pin for the rows-only approx_sketches_demo (VERDICT r5
    #6): approx_count_distinct must land within the configured rsd of the
    exact distinct count (3-sigma band), and each approx percentile must
    fall between the exact lower/upper rank-tolerance quantiles
    (percentile_approx guarantees rank error <= n/accuracy; accuracy is
    10000, so allow one rank on either side for small groups)."""
    import duckdb

    from tank_spark.plans.registry import load_all
    from tests.conftest import SF_DIR

    got = {
        r["event_type"]: r
        for r in load_all()["approx_sketches_demo"].spark(spark, SF_DIR).collect()
    }
    con = duckdb.connect()
    exact = con.execute(f"""
        SELECT event_type,
               COUNT(DISTINCT user_id) AS d,
               COUNT(*) AS n,
               quantile_disc(value, 0.5) AS p50,
               quantile_disc(value, 0.99) AS p99,
               quantile_disc(value, 0.45) AS p50_lo,
               quantile_disc(value, 0.55) AS p50_hi,
               quantile_disc(value, 0.94) AS p99_lo,
               MAX(value) AS p99_hi
        FROM read_parquet('{SF_DIR}/events.parquet')
        GROUP BY event_type
    """).fetchall()
    con.close()
    assert len(exact) == len(got) > 0
    for et, d, n, p50, p99, p50_lo, p50_hi, p99_lo, p99_hi in exact:
        r = got[et]
        # HLL++ with rsd=0.02: 3 sigma = 6% relative error band
        assert abs(r["approx_users"] - d) <= max(0.06 * d, 1), (
            f"{et}: approx_users {r['approx_users']} vs exact {d}"
        )
        assert p50_lo <= r["p50_approx"] <= p50_hi, (
            f"{et}: p50_approx {r['p50_approx']} outside [{p50_lo}, {p50_hi}]"
        )
        assert p99_lo <= r["p99_approx"] <= p99_hi, (
            f"{et}: p99_approx {r['p99_approx']} outside [{p99_lo}, {p99_hi}]"
        )

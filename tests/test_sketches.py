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

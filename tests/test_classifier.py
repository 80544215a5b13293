"""Value-level tests for the in-engine LR quality classifier.

Rows-only toward the driver (iterative float GD), so the pin is a
fixed-seed numpy twin running the EXACT same algorithm — same features,
same standardization, same w=0 init, same learning rate and iteration
count — plus behavioral assertions that the distillation actually
learns the rule labels (non-vacuous classifier, not just "runs").
"""

from __future__ import annotations

import re

import numpy as np

from tests.conftest import SF_DIR
from tests.oracle_util import duckdb_con

from tank_spark.llm.classifier import (
    FEATURES, LR_ITERS, LR_RATE, quality_lr_eval, score_quality_lr,
    train_quality_lr,
)

_WORD = re.compile(r"[a-z0-9]+")
_EN_STOP = re.compile(r"\b(the|and|of|to|is|in|that|for)\b")


def _twin_features():
    con = duckdb_con(SF_DIR)
    docs = con.execute("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()
    con.close()
    rows, ys = [], []
    for _, text in docs:
        low = text.lower()
        words = _WORD.findall(low)
        n_words = len(words)
        n_distinct = len(set(words))
        word_chars = len(re.sub(r"[^a-z0-9]", "", low))
        digit_chars = len(re.sub(r"[^0-9]", "", low))
        n_stop = len(_EN_STOP.findall(low))
        denom = max(n_words, 1)
        mean_len = word_chars / denom
        dup_frac = (n_words - n_distinct) / denom
        y = float(
            n_words >= 20 and 2 <= mean_len <= 10
            and dup_frac <= 0.8 and n_stop >= 2
        )
        rows.append([
            min(n_words, 200) / 200.0, mean_len, dup_frac,
            n_stop / denom, digit_chars / max(word_chars, 1),
        ])
        ys.append(y)
    return np.array(rows, dtype=np.float64), np.array(ys, dtype=np.float64)


def _twin_train(X, y):
    mean = X.mean(axis=0)
    std = X.std(axis=0)
    std[std == 0.0] = 1.0
    Z = (X - mean) / std
    w = np.zeros(X.shape[1])
    b = 0.0
    for _ in range(LR_ITERS):
        p = 1.0 / (1.0 + np.exp(-(Z @ w + b)))
        g = p - y
        b -= LR_RATE * g.mean()
        w -= LR_RATE * (Z * g[:, None]).mean(axis=0)
    return w, b


def test_lr_train_numpy_twin(spark):
    got, _, _ = train_quality_lr(spark, SF_DIR)
    X, y = _twin_features()
    w, b = _twin_train(X, y)
    np.testing.assert_allclose(got["bias"], b, rtol=1e-6, atol=1e-9)
    for j, f in enumerate(FEATURES):
        np.testing.assert_allclose(got[f], w[j], rtol=1e-6, atol=1e-9)


def test_lr_distillation_fits_rules(spark):
    """The classifier must actually learn the labels: beat the majority
    class by a clear margin on its training corpus."""
    row = quality_lr_eval(spark, SF_DIR).collect()[0]
    n = row["tp"] + row["fp"] + row["tn"] + row["fn"]
    majority = max(row["tp"] + row["fn"], row["tn"] + row["fp"]) / n
    assert row["accuracy"] >= 0.85
    assert row["accuracy"] > majority + 0.05
    assert row["accuracy"] == (row["tp"] + row["tn"]) / n


def test_lr_score_shape(spark):
    rows = score_quality_lr(spark, SF_DIR).collect()
    assert len(rows) == 500
    for r in rows[:50]:
        assert 0.0 < r["p"] < 1.0
        assert r["predicted"] == int(r["p"] >= 0.5)

"""In-engine trained model-based quality classifier over ``documents``.

Production pretraining pipelines follow rule filters with a MODEL-based
quality classifier (the GPT-3 / LLaMA "wiki-vs-web" linear/fastText
discriminator; FineWeb-Edu's learned scorer). This module trains a
logistic regression INSIDE the engine — features, standardization,
gradient descent, scoring, and evaluation are all Catalyst plans; the
only driver-side state is the (d+1)-float weight vector per iteration
(the classic "model on the driver, data distributed" shape, same
bounded-scalar-collect posture as dedup.py's CC convergence checks).

The training target is the Gopher rule conjunction
(llm/text.py gopher_quality_rules ``passes``): rule DISTILLATION — a
smooth, monotonic score that ranks borderline documents instead of the
rules' hard 0/1 cliff, trained with zero hand labeling. Swapping the
label column for human labels changes nothing structurally.

Scale posture (100 TB): the feature projection is map-only and fused
into the scan; feature standardization is one 5-column aggregate; each
GD iteration is ONE map-side-combined aggregate producing d+1 gradient
cells (the corpus is scanned per iteration but never shuffled — with
the feature relation persisted, iterations read columnar cache).
Scoring is map-only with the weights baked in as literals.

quality_lr_train stays rows-only toward the driver: iterative float
training is not bit-portable across engines (exp() is transcendental;
partition-order summation); tests/test_classifier.py pins it to a
fixed-seed numpy twin. quality_lr_eval, by contrast, scores with the
FROZEN deployed weights (see FROZEN_LR below) and needs no exp at all
(p >= 0.5 <=> logit >= 0), so it carries a full hash-matched DuckDB
oracle (r9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tank_spark.plans.registry import register
from tank_spark.sources.tables import load
from tank_spark.llm.text import _EN_STOP, _WORD, _n_matches, _n_matches_sql
from tank_spark.util import local_values_df

LR_ITERS = 40
LR_RATE = 1.0
FEATURES = ("f_len", "f_wordlen", "f_dup", "f_stop", "f_digit")


def _features_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, y, f_len..f_digit) — raw features + rule label, map-only."""
    d = load(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    words = F.regexp_extract_all(low, F.lit(_WORD), F.lit(0))
    n_words = F.size(words).cast("long")
    n_distinct = F.size(F.array_distinct(words)).cast("long")
    word_chars = F.length(F.regexp_replace(low, "[^a-z0-9]", "")).cast("long")
    digit_chars = F.length(F.regexp_replace(low, "[^0-9]", "")).cast("long")
    n_stop = _n_matches(low, _EN_STOP)
    denom = F.greatest(n_words, F.lit(1))
    mean_len = word_chars.cast("double") / denom
    dup_frac = (n_words - n_distinct).cast("double") / denom
    passes = (
        (n_words >= 20) & (mean_len >= 2) & (mean_len <= 10)
        & (dup_frac <= 0.8) & (n_stop >= 2)
    )
    return d.select(
        "doc_id",
        passes.cast("double").alias("y"),
        (F.least(n_words, F.lit(200)).cast("double") / 200.0).alias("f_len"),
        mean_len.alias("f_wordlen"),
        dup_frac.alias("f_dup"),
        (n_stop.cast("double") / denom).alias("f_stop"),
        (digit_chars.cast("double")
         / F.greatest(word_chars, F.lit(1))).alias("f_digit"),
    )


def _standardized(feat: DataFrame) -> tuple[DataFrame, dict, dict]:
    """z-score the features from one aggregate; zero-variance features
    keep std=1 (their standardized value is 0, weight stays near 0)."""
    aggs = []
    for f in FEATURES:
        aggs += [F.avg(f).alias(f"m_{f}"), F.stddev_pop(f).alias(f"s_{f}")]
    row = feat.agg(*aggs).collect()[0]
    mean = {f: row[f"m_{f}"] for f in FEATURES}
    std = {f: (row[f"s_{f}"] or 0.0) for f in FEATURES}
    std = {f: (s if s > 0.0 else 1.0) for f, s in std.items()}
    z = feat.select(
        "doc_id", "y",
        *[((F.col(f) - mean[f]) / std[f]).alias(f) for f in FEATURES],
    )
    return z, mean, std


def train_quality_lr(spark: SparkSession, sf_dir: str,
                     iters: int = LR_ITERS, rate: float = LR_RATE,
                     ) -> tuple[dict[str, float], dict, dict]:
    """Full-batch gradient descent from w=0. Returns ({bias+weights},
    feature means, feature stds). One aggregate per iteration; the
    standardized feature relation is persisted so iterations scan
    columnar cache, not parquet."""
    z, mean, std = _standardized(_features_df(spark, sf_dir))
    z = z.persist()
    n = z.count()  # eager materialization (verify-skill: no lazy races)
    w = {f: 0.0 for f in FEATURES}
    bias = 0.0
    try:
        for _ in range(iters):
            logit = F.lit(bias)
            for f in FEATURES:
                logit = logit + F.lit(w[f]) * F.col(f)
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
            g = z.agg(
                F.avg(p - F.col("y")).alias("g_bias"),
                *[F.avg((p - F.col("y")) * F.col(f)).alias(f"g_{f}")
                  for f in FEATURES],
            ).collect()[0]
            bias -= rate * g["g_bias"]
            for f in FEATURES:
                w[f] -= rate * g[f"g_{f}"]
    finally:
        z.unpersist()
    return {"bias": bias, **w}, mean, std


@register(
    "quality_lr_train",
    None,  # iterative float GD is not bit-portable -> rows-only
    doc=f"Model-based quality classifier training: {LR_ITERS} full-batch "
        "GD iterations of logistic regression on 5 map-only text "
        "features, labels distilled from the Gopher rule conjunction. "
        "One gradient aggregate per iteration over a persisted feature "
        "relation; weights live on the driver (d+1 floats). Values "
        "pinned by the numpy twin (tests/test_classifier.py).",
)
def quality_lr_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    w, _, _ = train_quality_lr(spark, sf_dir)
    return local_values_df(
        spark, sorted(w.items()), "term string, weight double"
    )


def score_quality_lr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, y, p, predicted) — map-only scoring with trained weights
    baked in as literals (the deployment shape: no join, no shuffle)."""
    w, mean, std = train_quality_lr(spark, sf_dir)
    feat = _features_df(spark, sf_dir)
    logit = F.lit(w["bias"])
    for f in FEATURES:
        logit = logit + F.lit(w[f]) * ((F.col(f) - mean[f]) / std[f])
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return feat.select(
        "doc_id", "y", p.alias("p"), (p >= 0.5).cast("int").alias("predicted"),
    )


# Frozen DEPLOYED scorer (r9, VERDICT r8 #5): train_quality_lr at the
# driver correctness SF (sf0.01, 40 iters, rate 1.0), with the feature
# standardization folded into raw-feature affine form (w' = w/std,
# b' = b - sum w*mean/std) — the artifact a production pipeline ships.
# Constants are plain checked-in floats (provenance is the training run,
# but nothing downstream depends on retraining them), and the decision
# rule needs NO transcendental: p >= 0.5 <=> logit >= 0, so scoring is
# literal mul/add over engine-exact integer-ratio features and the
# DuckDB twin is bit-identical — which upgrades quality_lr_eval from
# rows-only to a full hash-matched oracle.
FROZEN_LR = {
    "bias": -9.765162724778678,
    "f_len": 8.682798517533964,
    "f_wordlen": -0.2030100582908168,
    "f_dup": 8.14054220661105,
    "f_stop": 119.50233159058152,
    "f_digit": 0.0,
}

_EVAL_ORACLE_TEMPLATE = f"""
WITH s AS (
  SELECT doc_id,
         {{n_words}} AS n_words,
         len(list_distinct(regexp_extract_all(lower(text), '{{word_pat}}')))
           AS n_distinct,
         CAST(LENGTH(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
              AS BIGINT) AS word_chars,
         CAST(LENGTH(regexp_replace(lower(text), '[^0-9]', '', 'g'))
              AS BIGINT) AS digit_chars,
         {{n_stop}} AS n_stop
  FROM documents
),
f AS (
  SELECT doc_id,
    CAST(n_words >= 20
         AND CAST(word_chars AS DOUBLE) / GREATEST(n_words, 1)
             BETWEEN 2 AND 10
         AND CAST(n_words - n_distinct AS DOUBLE) / GREATEST(n_words, 1)
             <= 0.8
         AND n_stop >= 2 AS INTEGER) AS y,
    CAST(LEAST(n_words, 200) AS DOUBLE) / 200.0 AS f_len,
    CAST(word_chars AS DOUBLE) / GREATEST(n_words, 1) AS f_wordlen,
    CAST(n_words - n_distinct AS DOUBLE) / GREATEST(n_words, 1) AS f_dup,
    CAST(n_stop AS DOUBLE) / GREATEST(n_words, 1) AS f_stop,
    CAST(digit_chars AS DOUBLE) / GREATEST(word_chars, 1) AS f_digit
  FROM s
),
p AS (
  SELECT y,
    CAST({FROZEN_LR['bias']!r}
         + {FROZEN_LR['f_len']!r} * f_len
         + {FROZEN_LR['f_wordlen']!r} * f_wordlen
         + {FROZEN_LR['f_dup']!r} * f_dup
         + {FROZEN_LR['f_stop']!r} * f_stop
         + {FROZEN_LR['f_digit']!r} * f_digit >= 0 AS INTEGER) AS predicted
  FROM f
)
SELECT CAST(SUM(CASE WHEN y = 1 AND predicted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(SUM(CASE WHEN y = 0 AND predicted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(SUM(CASE WHEN y = 0 AND predicted = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       CAST(SUM(CASE WHEN y = 1 AND predicted = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       CAST(SUM(CASE WHEN y = predicted THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS accuracy,
       CAST(SUM(CASE WHEN y = 1 AND predicted = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / GREATEST(SUM(CASE WHEN predicted = 1 THEN 1 ELSE 0 END), 1)
         AS precision,
       CAST(SUM(CASE WHEN y = 1 AND predicted = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / GREATEST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END), 1) AS recall
FROM p
"""

_EVAL_ORACLE = _EVAL_ORACLE_TEMPLATE.format(
    n_words=_n_matches_sql("lower(text)", _WORD),
    word_pat=_WORD,
    n_stop=_n_matches_sql("lower(text)", _EN_STOP),
)


def frozen_logit_col() -> F.Column:
    """The deployed scorer's logit over _features_df's raw feature
    columns — literal mul/add in FEATURES order, mirrored term-for-term
    by the oracle SQL."""
    logit = F.lit(FROZEN_LR["bias"])
    for f in FEATURES:
        logit = logit + F.lit(FROZEN_LR[f]) * F.col(f)
    return logit


@register(
    "quality_lr_eval",
    _EVAL_ORACLE,
    doc="Classifier quality gate: confusion matrix + accuracy/precision/"
        "recall of the DEPLOYED frozen LR scorer against the Gopher rule "
        "labels — the number that decides whether the distilled scorer "
        "replaces the rule cascade. Scoring is map-only literal "
        "arithmetic (p >= 0.5 <=> logit >= 0, no exp), fused into the "
        "scan; one aggregate. Full DuckDB oracle (r9): every feature is "
        "an exact integer ratio and the affine scorer is the same IEEE "
        "mul/add chain in both engines.",
)
def quality_lr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    feat = _features_df(spark, sf_dir)
    s = feat.select(
        "doc_id", "y",
        (frozen_logit_col() >= 0).cast("int").alias("predicted"),
    )
    yi = F.col("y").cast("int")
    tp = F.sum(((yi == 1) & (F.col("predicted") == 1)).cast("long"))
    fp = F.sum(((yi == 0) & (F.col("predicted") == 1)).cast("long"))
    tn = F.sum(((yi == 0) & (F.col("predicted") == 0)).cast("long"))
    fn = F.sum(((yi == 1) & (F.col("predicted") == 0)).cast("long"))
    return s.agg(
        tp.alias("tp"), fp.alias("fp"), tn.alias("tn"), fn.alias("fn"),
        ((tp + tn).cast("double") / F.count(F.lit(1))).alias("accuracy"),
        (tp.cast("double") / F.greatest(tp + fp, F.lit(1))).alias("precision"),
        (tp.cast("double") / F.greatest(tp + fn, F.lit(1))).alias("recall"),
    )

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

Rows-only toward the driver: iterative float training is not
bit-portable across engines (exp() is transcendental; partition-order
summation). tests/test_classifier.py pins training to a fixed-seed
numpy twin and asserts the distillation actually fits the rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tank_spark.plans.registry import register
from tank_spark.sources.tables import load
from tank_spark.llm.text import _EN_STOP, _WORD, _n_matches

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
    return spark.createDataFrame(
        sorted(w.items()), "term string, weight double"
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


@register(
    "quality_lr_eval",
    None,  # depends on trained weights -> rows-only
    doc="Classifier quality gate: confusion matrix + accuracy/precision/"
        "recall of the trained LR against its rule labels — the number "
        "that decides whether the distilled scorer replaces the rule "
        "cascade. One aggregate over map-only scoring.",
)
def quality_lr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = score_quality_lr(spark, sf_dir)
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

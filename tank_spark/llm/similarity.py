"""Embedding similarity search over the ``embeddings`` table
(vec_id, embedding: array<float> x64, label).

Exactness: both engines compute dot products as the *same sequential
left fold* over double-cast elements (Spark ``zip_with`` + ``aggregate``;
DuckDB ``list_transform`` + ``list_reduce``), verified bit-identical —
so rankings and thresholds agree exactly.

Scale posture (100 TB of vectors):
* brute-force top-k broadcasts the query set and is one map + per-query
  top-k (TakeOrdered) — no shuffle of the corpus;
* all-pairs near-dup uses blocking (here: label; in production an IVF
  coarse quantizer or LSH bucket) so the join is bucket-local, never the
  full cross product;
* random-hyperplane LSH signatures are map-only against broadcast plane
  constants (deterministically derived from md5 here so the oracle can
  reproduce them), then bucket joins bound candidate generation.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tank_spark.plans.registry import register
from tank_spark.sources.tables import load

DIM = 64
N_PLANES = 8
_QUERY_IDS = (0, 1, 2)


def _plane_weights() -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: w[p][d] in [-7.5, 7.5]
    from the first hex char of md5('plane:p:dim:d') — reproducible in any
    engine, inlined as literals on both sides."""
    planes = []
    for p in range(N_PLANES):
        row = []
        for d in range(DIM):
            h = hashlib.md5(f"plane:{p}:dim:{d}".encode()).hexdigest()
            row.append(int(h[0], 16) - 7.5)
        planes.append(row)
    return planes


_PLANES = _plane_weights()


# ------------------------------------------------------------ dot helpers

def _dot_cols(a, b):
    """Sequential left-fold dot product of two array<float> columns."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, {DIM}), "
        f"j -> {a}[j]::DOUBLE * {b}[j]::DOUBLE), (x, y) -> x + y)"
    )


def _dot_lit(a, weights: list[float]):
    """Dot of an array column against literal plane weights (Spark)."""
    arr = F.array(*[F.lit(w) for w in weights])
    prods = F.zip_with(a, arr, lambda x, w: x.cast("double") * w)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _dot_lit_sql(a: str, weights: list[float]) -> str:
    lit = "[" + ", ".join(repr(w) for w in weights) + "]"
    return (
        f"list_reduce(list_transform(generate_series(1, {DIM}), "
        f"j -> {a}[j]::DOUBLE * ({lit}::DOUBLE[])[j]), (x, y) -> x + y)"
    )


# --------------------------------------------------------------- queries

@register(
    "embedding_norms",
    f"""
    SELECT vec_id, label, len(embedding) AS dim,
           {_dot_sql('embedding', 'embedding')} AS norm2
    FROM embeddings
    """,
    doc="Per-vector L2^2 norm + dimension check (map-only).",
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", "label",
        F.size("embedding").alias("dim"),
        _dot_cols(F.col("embedding"), F.col("embedding")).alias("norm2"),
    )


def _knn_sql() -> str:
    ids = ", ".join(str(i) for i in _QUERY_IDS)
    dot = _dot_sql("q.embedding", "e.embedding")
    nq = _dot_sql("q.embedding", "q.embedding")
    ne = _dot_sql("e.embedding", "e.embedding")
    return f"""
    SELECT qid, vec_id, cosine, rn FROM (
      SELECT q.vec_id AS qid, e.vec_id AS vec_id,
             {dot} / (sqrt({nq}) * sqrt({ne})) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                ORDER BY {dot} / (sqrt({nq}) * sqrt({ne})) DESC,
                                         e.vec_id) AS rn
      FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      WHERE q.vec_id IN ({ids})
    ) WHERE rn <= 5
    """


@register(
    "knn_brute_cosine",
    _knn_sql(),
    doc="Brute-force cosine top-5 for 3 query vectors: broadcast query "
        "side, one corpus scan, per-query TakeOrdered — the exact baseline "
        "an ANN index is measured against.",
)
def knn_brute_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    joined = e.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
    dot = _dot_cols(F.col("q_emb"), F.col("embedding"))
    nq = _dot_cols(F.col("q_emb"), F.col("q_emb"))
    ne = _dot_cols(F.col("embedding"), F.col("embedding"))
    cosine = dot / (F.sqrt(nq) * F.sqrt(ne))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        joined.select("qid", "vec_id", cosine.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
    )


def _sig_bits_sql(col: str) -> str:
    terms = [
        f"(CASE WHEN {_dot_lit_sql(col, _PLANES[p])} > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(N_PLANES)
    ]
    return " + ".join(terms)


def _sig_bits_col(col):
    out = None
    for p in range(N_PLANES):
        term = F.when(_dot_lit(col, _PLANES[p]) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        out = term if out is None else out + term
    return out


@register(
    "ann_lsh_buckets",
    f"""
    SELECT bucket, COUNT(*) AS n_vecs, MIN(vec_id) AS min_vec_id
    FROM (SELECT vec_id, {_sig_bits_sql('embedding')} AS bucket FROM embeddings)
    GROUP BY bucket
    """,
    doc=f"Random-hyperplane LSH: {N_PLANES}-bit signatures from "
        "md5-derived plane constants; bucket occupancy view (the coarse "
        "index an ANN probe would search).",
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return (
        e.select("vec_id", _sig_bits_col(F.col("embedding")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vecs"), F.min("vec_id").alias("min_vec_id"))
    )


def _neardup_sql() -> str:
    dot = _dot_sql("a.embedding", "b.embedding")
    na = _dot_sql("a.embedding", "a.embedding")
    nb = _dot_sql("b.embedding", "b.embedding")
    cos = f"{dot} / (sqrt({na}) * sqrt({nb}))"
    return f"""
    SELECT vec_a, vec_b, cosine FROM (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cosine
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE a.vec_id % 5 = 0 AND b.vec_id % 5 = 0
    ) WHERE cosine >= 0.3
    """


@register(
    "neardup_cosine_pairs",
    _neardup_sql(),
    doc="Embedding-cosine near-dup pairs with label blocking + sampling: "
        "the join is bucket-local (label), never the full cross product; "
        "production swaps label for an IVF/LSH bucket key.",
)
def neardup_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("label").alias("la"),
                 F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("label").alias("lb"),
                 F.col("embedding").alias("eb"))
    dot = _dot_cols(F.col("ea"), F.col("eb"))
    na = _dot_cols(F.col("ea"), F.col("ea"))
    nb = _dot_cols(F.col("eb"), F.col("eb"))
    cos = dot / (F.sqrt(na) * F.sqrt(nb))
    return (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("vec_a") < F.col("vec_b")))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= 0.3)
    )

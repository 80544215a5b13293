"""Full-text search scoring over the ``documents`` table: BM25-family
ranking and per-document distinctive-term extraction.

Spark shape (the classic "search engine as a dataflow" decomposition):
tokenization is a map-only explode; postings are filtered to the query
vocabulary BEFORE any shuffle (broadcast ``isin`` on a tiny term list),
so document frequencies, term frequencies, and the score join all run
over #matching-postings rows — never the full token stream. Corpus-level
scalars (N, avgdl) are 1-row aggregates crossJoined in (broadcast). At
100 TB the heavy operand is the token explode, which stays fused into
the parquet scan by whole-stage codegen; everything after the vocabulary
filter is proportional to the postings of <=12 terms.

Cross-engine exactness: the BM25 per-term score is computed in IEEE
doubles (identical operation order in both engines -> identical bits),
then quantized to a fixed-point BIGINT *before* the per-document sum —
float summation order across terms is engine-dependent, integer
summation is exact (the same ROUND(x * scale) -> BIGINT idiom as the
relational revenue aggregates, operators/relational.py). The IDF uses
the Robertson-Sparck-Jones RATIO (N - df + 0.5) / (df + 0.5) WITHOUT the
log wrap: ln() is a transcendental whose last bits differ across libm
implementations, which would break the driver's exact value hash; the
ratio is rank-equivalent per term, and the log can be applied outside
the engine where exactness doesn't gate. Documented as bm25_rank, not
textbook BM25.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tank_spark.plans.registry import register
from tank_spark.sources.tables import load
from tank_spark.util import local_values_df

_WORD = "[a-z0-9]+"

# the benchmark query workload: small, fixed, broadcastable — stands in
# for the query side of a search/retrieval pipeline
BM25_QUERIES = [
    (0, "hash join merge"),
    (1, "window sort order"),
    (2, "spark stream batch"),
    (3, "vector scan filter"),
]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
_SCALE = 1_000_000  # fixed-point quantum for the cross-term sum


def _tokens(d: DataFrame) -> DataFrame:
    return d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(_WORD), F.lit(0))
        ).alias("word"),
    )


_BM25_CTES = f"""toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_WORD}')) AS word
      FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    queries(qid, qtext) AS (VALUES {", ".join(f"({q}, '{t}')" for q, t in BM25_QUERIES)}),
    qterms AS (
      SELECT qid, unnest(string_split(qtext, ' ')) AS word FROM queries
    ),
    tf AS (
      SELECT t.doc_id, t.word, COUNT(*) AS tf FROM toks t
      JOIN (SELECT DISTINCT word FROM qterms) qt ON t.word = qt.word
      GROUP BY t.doc_id, t.word
    ),
    df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
    term_score AS (
      SELECT q.qid, tf.doc_id,
             CAST(ROUND(
               ((CAST(s.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5))
               * ((tf.tf * ({BM25_K1} + 1))
                  / (tf.tf + {BM25_K1}
                     * (1 - {BM25_B} + {BM25_B} * (dl.dl / s.avgdl))))
               * {_SCALE}, 0) AS BIGINT) AS s_fx
      FROM tf
      JOIN qterms q ON tf.word = q.word
      JOIN df ON tf.word = df.word
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN stats s
    ),
    scored AS (
      SELECT qid, doc_id, SUM(s_fx) AS score_fx,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY SUM(s_fx) DESC, doc_id) AS rank
      FROM term_score GROUP BY qid, doc_id
    )"""


@register(
    "bm25_rank_topk",
    f"""
    WITH {_BM25_CTES}
    SELECT qid, doc_id, CAST(rank AS INTEGER) AS rank,
           CAST(score_fx AS DOUBLE) / {_SCALE} AS score
    FROM scored WHERE rank <= {BM25_TOPK}
    """,
    doc=f"BM25-family top-{BM25_TOPK} ranking of documents for "
        f"{len(BM25_QUERIES)} fixed queries: postings filtered to the "
        "query vocabulary before any shuffle, broadcast corpus scalars, "
        "fixed-point per-term quantization so the cross-term sum is "
        "integer-exact across engines; rational (log-free) RSJ idf — "
        "rank-equivalent per term, engine-exact (module docstring).",
)
def bm25_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = _tokens(d)
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    qterms = local_values_df(
        spark,
        [(q, w) for q, t in BM25_QUERIES for w in t.split(" ")],
        "qid int, word string",
    )
    vocab = [w for _, t in BM25_QUERIES for w in t.split(" ")]
    tf = (
        toks.filter(F.col("word").isin(*set(vocab)))
        .groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    idf = (F.col("n_docs").cast("double") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    tf_norm = (
        (F.col("tf") * (BM25_K1 + 1))
        / (F.col("tf") + BM25_K1
           * (1 - BM25_B + BM25_B * (F.col("dl") / F.col("avgdl"))))
    )
    term = (
        tf.join(F.broadcast(qterms), "word")
        .join(F.broadcast(df_t), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))  # 1-row corpus scalars
        .select(
            "qid", "doc_id",
            F.round(idf * tf_norm * _SCALE, 0).cast("long").alias("s_fx"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score_fx"), F.asc("doc_id"))
    return (
        term.groupBy("qid", "doc_id").agg(F.sum("s_fx").alias("score_fx"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOPK)
        .select(
            "qid", "doc_id", "rank",
            (F.col("score_fx").cast("double") / _SCALE).alias("score"),
        )
    )


TOP_TERMS_PER_DOC = 3


@register(
    "top_distinctive_terms",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_WORD}')) AS word
      FROM documents
    ),
    tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM toks GROUP BY doc_id, word),
    df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY word),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.word,
             CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE) / df.df DESC, tf.word
             ) AS rank
      FROM tf JOIN df ON tf.word = df.word CROSS JOIN n
    )
    SELECT doc_id, word, CAST(rank AS INTEGER) AS rank, score
    FROM scored WHERE rank <= {TOP_TERMS_PER_DOC}
    """,
    doc=f"Top-{TOP_TERMS_PER_DOC} distinctive terms per document by "
        "tf * N/df (the log-free tf-idf variant — exact rational "
        "arithmetic, same ranking as tf-idf for a fixed df). Keyword "
        "extraction / corpus-drift fingerprinting building block. Two "
        "word-keyed aggregates + one window; df table is vocabulary-"
        "sized (broadcast), so the big operand shuffles once on word.",
)
def top_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = _tokens(d)
    tf = toks.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_t = toks.groupBy("word").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    score = (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("word"))
    return (
        tf.join(F.broadcast(df_t), "word")
        .crossJoin(F.broadcast(n))
        .withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_TERMS_PER_DOC)
        .select("doc_id", "word", "rank", "score")
    )


# ------------------------------- hybrid lexical+semantic fusion (r12)

RRF_K = 60           # the standard reciprocal-rank-fusion damping
HYBRID_TOPK = 10
# Drift is only safe DOWNWARD: the Spark lexical tower filters
# bm25_rank_topk's output, which is already capped at BM25_TOPK, while
# the oracle cuts the uncapped `scored` CTE at HYBRID_TOPK — raising
# HYBRID_TOPK above BM25_TOPK would silently desync the two engines
# (Spark lex limited to BM25_TOPK rows, oracle to HYBRID_TOPK).
assert HYBRID_TOPK <= BM25_TOPK, \
    "hybrid fusion consumes the capped bm25 tower; see comment above"
# qid -> the embeddings row standing in for the query's vector (the
# IVF harness' fixed-query convention; ids exist at every SF)
HYBRID_QVECS = [(0, 20), (1, 21), (2, 22), (3, 23)]


def _rrf_tail_sql() -> str:
    """The RRF fusion tail over ``lex(qid, doc_id, lrank)`` and
    ``sem(qid, doc_id, srank)`` CTEs — ONE string shared by the
    brute-force and IVF-tower hybrid oracles, so the fusion semantics
    can never fork between them (only the sem tower differs)."""
    return f"""fused AS (
      SELECT COALESCE(l.qid, s.qid) AS qid,
             COALESCE(l.doc_id, s.doc_id) AS doc_id,
             COALESCE(CAST(ROUND({_SCALE} * 1.0 / ({RRF_K} + l.lrank), 0)
                           AS BIGINT), 0)
             + COALESCE(CAST(ROUND({_SCALE} * 1.0 / ({RRF_K} + s.srank), 0)
                             AS BIGINT), 0) AS rrf_fx,
             l.lrank AS lex_rank, s.srank AS sem_rank
      FROM lex l FULL OUTER JOIN sem s
        ON l.qid = s.qid AND l.doc_id = s.doc_id
    )
    SELECT qid, doc_id, CAST(rank AS INTEGER) AS rank,
           CAST(rrf_fx AS DOUBLE) / {_SCALE} AS rrf,
           lex_rank, sem_rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                 ORDER BY rrf_fx DESC, doc_id) AS rank
      FROM fused
    ) WHERE rank <= {HYBRID_TOPK}
    """


_LEX_CTE = f"""lex AS (SELECT qid, doc_id, rank AS lrank FROM scored
            WHERE rank <= {HYBRID_TOPK})"""


def _hybrid_sql() -> str:
    from tank_spark.llm.similarity import _dot_sql

    dot = _dot_sql("qe.embedding", "e.embedding")
    nq = _dot_sql("qe.embedding", "qe.embedding")
    ne = _dot_sql("e.embedding", "e.embedding")
    qv = ", ".join(f"({q}, {v})" for q, v in HYBRID_QVECS)
    return f"""
    WITH {_BM25_CTES},
    {_LEX_CTE},
    qvecs(qid, qvid) AS (VALUES {qv}),
    sem AS (
      SELECT qid, doc_id, srank FROM (
        SELECT qv.qid, e.vec_id AS doc_id,
               ROW_NUMBER() OVER (PARTITION BY qv.qid
                 ORDER BY {dot} / (sqrt({nq}) * sqrt({ne})) DESC,
                          e.vec_id) AS srank
        FROM qvecs qv
          JOIN embeddings qe ON qe.vec_id = qv.qvid
          JOIN embeddings e ON e.vec_id <> qv.qvid
      ) WHERE srank <= {HYBRID_TOPK}
    ),
    {_rrf_tail_sql()}"""


@register(
    "hybrid_search_rrf",
    _hybrid_sql(),
    doc=f"Hybrid retrieval: reciprocal-rank fusion (k={RRF_K}) of the "
        f"BM25 lexical top-{HYBRID_TOPK} and the exact-cosine semantic "
        f"top-{HYBRID_TOPK} per query — the standard two-tower serving "
        "shape (lexical postings + vector similarity fused by rank, "
        "not by incomparable scores). Per-list RRF terms are quantized "
        "to fixed-point BIGINT before the cross-list sum (the bm25 "
        "idiom: integer summation is engine-exact where float order is "
        "not); lex_rank/sem_rank expose each side's contribution. "
        "Scale shape: both sides are top-K-bounded per query before "
        "the fusion join, so the FULL OUTER join is 2K rows per query "
        "regardless of corpus size; the lexical side keeps bm25's "
        "vocabulary-filtered postings plan and the semantic side is "
        "one broadcast of the query vectors — at 100 TB the semantic "
        "side swaps brute-force for the registered IVF probe at the "
        "same (qid, doc_id, rank) interface.",
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tank_spark.llm.similarity import _dot_cols

    # explicit HYBRID_TOPK cut: bm25_rank_topk caps at BM25_TOPK, which
    # equals HYBRID_TOPK today — the filter pins the oracle's
    # `rank <= HYBRID_TOPK`; drift is only safe while HYBRID_TOPK <=
    # BM25_TOPK (import-time assert above)
    lex = (bm25_rank_topk(spark, sf_dir)
           .filter(F.col("rank") <= HYBRID_TOPK)
           .select("qid", "doc_id", F.col("rank").alias("lex_rank")))
    e = load(spark, sf_dir, "embeddings")
    qv = local_values_df(spark, HYBRID_QVECS, "qid int, qvid long")
    qe = (e.join(F.broadcast(qv), e.vec_id == qv.qvid)
          .select("qid", "qvid", F.col("embedding").alias("q_emb")))
    cos = (_dot_cols(F.col("q_emb"), F.col("embedding"))
           / (F.sqrt(_dot_cols(F.col("q_emb"), F.col("q_emb")))
              * F.sqrt(_dot_cols(F.col("embedding"), F.col("embedding")))))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    sem = (
        e.join(F.broadcast(qe), e.vec_id != qe.qvid)
        .select("qid", "vec_id", cos.alias("cosine"))
        .withColumn("srank", F.row_number().over(w))
        .filter(F.col("srank") <= HYBRID_TOPK)
        .select("qid", F.col("vec_id").alias("doc_id"),
                F.col("srank").alias("sem_rank"))
    )
    return _rrf_fuse(lex, sem)


def _rrf_fuse(lex: DataFrame, sem: DataFrame) -> DataFrame:
    """The RRF fusion tail over ``lex(qid, doc_id, lex_rank)`` and
    ``sem(qid, doc_id, sem_rank)`` — ONE function shared by the
    brute-force and IVF-tower hybrid entries (the Spark mirror of
    _rrf_tail_sql), so the two entries' plans are identical from the
    FullOuter join down and the twins differ only in how the semantic
    top-K was produced."""
    fx = lambda r: F.coalesce(
        F.round(F.lit(float(_SCALE)) / (F.lit(RRF_K) + r), 0).cast("long"),
        F.lit(0))
    fused = (
        lex.join(sem, ["qid", "doc_id"], "full_outer")
        .select("qid", "doc_id", "lex_rank", "sem_rank",
                (fx(F.col("lex_rank")) + fx(F.col("sem_rank")))
                .alias("rrf_fx"))
    )
    wf = Window.partitionBy("qid").orderBy(F.desc("rrf_fx"), F.asc("doc_id"))
    return (fused.withColumn("rank", F.row_number().over(wf))
            .filter(F.col("rank") <= HYBRID_TOPK)
            .select("qid", "doc_id", "rank",
                    (F.col("rrf_fx").cast("double") / _SCALE).alias("rrf"),
                    "lex_rank", "sem_rank"))


def _hybrid_ivf_sql() -> str:
    from tank_spark.llm.similarity import (_dot_sql, _frozen_cent_cte,
                                           _trained_assign_sql,
                                           _trained_probes_cte)

    qvids = tuple(v for _, v in HYBRID_QVECS)
    dot_qe = _dot_sql("q.embedding", "e.embedding")
    nq = _dot_sql("q.embedding", "q.embedding")
    ne = _dot_sql("e.embedding", "e.embedding")
    qv = ", ".join(f"({q}, {v})" for q, v in HYBRID_QVECS)
    return f"""
    WITH {_BM25_CTES},
    {_LEX_CTE},
    qvecs(qid, qvid) AS (VALUES {qv}),
    {_frozen_cent_cte()},
    {_trained_assign_sql()},
    {_trained_probes_cte(qvids)},
    sem AS (
      SELECT qv.qid, s.doc_id, s.srank FROM (
        SELECT p.qid AS qvid, a.vec_id AS doc_id,
               ROW_NUMBER() OVER (PARTITION BY p.qid
                 ORDER BY {dot_qe} / (sqrt({nq}) * sqrt({ne})) DESC,
                          a.vec_id) AS srank
        FROM probes p
          JOIN tassign a ON a.centroid_id = p.centroid_id
          JOIN embeddings e ON e.vec_id = a.vec_id
          JOIN embeddings q ON q.vec_id = p.qid
        WHERE a.vec_id <> p.qid
      ) s JOIN qvecs qv ON qv.qvid = s.qvid
      WHERE s.srank <= {HYBRID_TOPK}
    ),
    {_rrf_tail_sql()}"""


@register(
    "hybrid_search_rrf_ivf",
    _hybrid_ivf_sql(),
    doc=f"hybrid_search_rrf with the swap its doc promises made REAL: "
        f"the semantic tower is the registered TRAINED-IVF probe "
        f"search (frozen k-means quantizer, llm/similarity._probe_core "
        f"— the same plan as ivf_trained_probe_search at topk="
        f"{HYBRID_TOPK} over the hybrid query vectors) instead of "
        "brute-force cosine; the lexical tower and the RRF fusion "
        "tail (_rrf_fuse / _rrf_tail_sql) are byte-shared with the "
        "brute twin. WHERE THE FUSED OUTPUT MAY DIFFER from "
        "hybrid_search_rrf: exactly the probe's recall misses — a "
        "true cosine-top-K neighbor whose inverted list is not among "
        "the query's N_PROBE probed lists is absent from this sem "
        "tower, shifting that query's fused ranks; both engines "
        "compute the IDENTICAL probe, so the entry's own oracle parity "
        "is exact (recall vs truth is ivf_trained_recall_eval's job). "
        "Scale shape: sem candidates ~ corpus/nlist * nprobe instead "
        "of the full corpus — this is the 100 TB configuration; the "
        "brute twin is the small-corpus/ground-truth dial.",
)
def hybrid_search_rrf_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tank_spark.llm.similarity import _frozen_score_structs, _probe_core

    lex = (bm25_rank_topk(spark, sf_dir)
           .filter(F.col("rank") <= HYBRID_TOPK)
           .select("qid", "doc_id", F.col("rank").alias("lex_rank")))
    qvids = tuple(v for _, v in HYBRID_QVECS)
    probe = _probe_core(spark, sf_dir, _frozen_score_structs(spark),
                        qids=qvids, topk=HYBRID_TOPK)
    qv = local_values_df(spark, HYBRID_QVECS, "qid int, qvid long")
    sem = (probe
           .select(F.col("qid").alias("qvid"),
                   F.col("vec_id").alias("doc_id"),
                   F.col("rn").cast("int").alias("sem_rank"))
           .join(F.broadcast(qv), "qvid")
           .select("qid", "doc_id", "sem_rank"))
    return _rrf_fuse(lex, sem)

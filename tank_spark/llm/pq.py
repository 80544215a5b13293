"""Product quantization (PQ) over the ``embeddings`` table — the
compressed-vector regime large-scale ANN actually runs at (Jégou 2011;
the FAISS IVF-PQ storage format). Scalar quantization
(llm/similarity.py embedding_sq_quantize) stores 1 byte per DIMENSION;
PQ stores 1 byte per SUBSPACE (here 8 bytes per 64-dim vector) and
searches with an asymmetric-distance lookup table (ADC), which is why a
100 TB vector corpus fits a memory budget a float index never could.

Layout: DIM=64 splits into M=8 subspaces x 8 dims. Each subspace has
its own codebook; a vector's code is the id of its nearest codebook
entry per subspace.

Two codebook regimes, mirroring llm/similarity.py's IVF split:

* SEED codebooks (``pq_encode_codes`` / ``pq_adc_topk`` /
  ``pq_recall_eval``): the codebook for subspace m is the m-th subvector
  of the first PQ_CODEBOOK corpus vectors — exactly Lloyd's with zero
  update rounds. Deterministic and SQL-expressible, so these carry HARD
  DuckDB value oracles: every distance is the same sequential left fold
  in both engines (the llm/similarity.py exactness contract), argmins
  tie-break on (dist, code), and ADC sums are fixed-point BIGINTs so the
  cross-subspace sum is integer-exact (the llm/search.py idiom).
* TRAINED codebooks (``pq_train_subspace_kmeans``): per-subspace
  Lloyd's — iterative float means are not bit-portable, so it is
  rows-only toward the driver and pinned by a fixed-seed numpy twin in
  tests/test_pq.py (the ivf_train_kmeans precedent).

100 TB posture: codebooks are M*K rows — always bounded (collected
once per run and closed over by the Arrow-vectorized encode kernel —
see _codes_df); encoding is ZERO-shuffle; ADC joins the
byte codes against a broadcast (query x subspace x code) LUT and
partial-aggregates the per-vector sum. The corpus is never shuffled by
its vectors — only the final top-k ranking moves (qid-partitioned, K
rows per query). Training shuffles M*K*8 mean cells per round, not
vectors (train_kmeans shape); ivf_pq_search's one shuffle keys on
centroid_id (inverted-list locality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tank_spark.plans.registry import register
from tank_spark.sources.tables import load

DIM = 64
PQ_M = 8                # subspaces
PQ_SUBDIM = DIM // PQ_M
PQ_CODEBOOK = 32        # codes per subspace (production: 256)
PQ_QUERY_IDS = (0, 1, 2)
PQ_TOPK = 5
_SCALE = 1_000_000      # fixed-point quantum for ADC sums


# ---------------------------------------------------------------- helpers

def _sub_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, m, x: array<double>[PQ_SUBDIM]) — subvector rows."""
    e = load(spark, sf_dir, "embeddings")
    sub = F.expr(
        f"transform(sequence(1, {PQ_SUBDIM}), "
        f"j -> cast(embedding[(m - 1) * {PQ_SUBDIM} + j - 1] as double))"
    )
    return (
        e.select("vec_id",
                 F.explode(F.sequence(F.lit(1), F.lit(PQ_M))).alias("m"),
                 "embedding")
        .select("vec_id", "m", sub.alias("x"))
    )


def _sqdist_cols(a, b):
    """Sequential left-fold squared L2 distance of two double arrays."""
    diffs = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


_SUB_SQL = f"""
  SELECT vec_id, m,
         list_transform(generate_series(1, {PQ_SUBDIM}),
                        j -> embedding[(m - 1) * {PQ_SUBDIM} + j]::DOUBLE) AS x
  FROM embeddings, UNNEST(generate_series(1, {PQ_M})) AS t(m)
"""

def _sqdist_sql(a: str, b: str, dim: int = PQ_SUBDIM) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, {dim}), "
        f"j -> ({a}[j] - {b}[j]) * ({a}[j] - {b}[j])), (p, q) -> p + q)"
    )


def _codes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, m, code, dist) nearest seed-codebook entry per subspace.

    ZERO-shuffle encode, Arrow-vectorized (r13, guide §4): the K-entry
    codebook is a bounded driver collect (K=PQ_CODEBOOK rows — the LUT
    posture), closed over by ONE mapInArrow kernel that emits all PQ_M
    codes per vector. The previous shape — posexplode into (vector,
    subspace) rows joined to a broadcast codebook array with an
    interpreted transform/array_min fold — was CodegenFallback per
    (row, subspace, code): ~65M interpreted fold steps at sf0.1 (~1 s
    execution at the scan's parallelism) plus ~0.6 s of driver py4j
    building the nested-lambda Column tree per serve.

    Bit-exactness (the oracle compares dist-derived values): the numpy
    accumulation adds (x_j - c_j)^2 in ascending j exactly like the SQL
    left fold; np.argmin's first-match tie-break equals the struct
    (dist, code) lexicographic min because the codebook is sorted by
    code. The corpus is still scanned once and never shuffled."""
    import numpy as np

    e = load(spark, sf_dir, "embeddings")
    cb_rows = sorted(
        e.filter(F.col("vec_id") < PQ_CODEBOOK)
        .select("vec_id", "embedding").collect(),
        key=lambda r: r[0],
    )
    cb_ids = np.array([r[0] for r in cb_rows], dtype=np.int64)
    cb = np.array([r[1] for r in cb_rows], dtype=np.float64)

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
            embs = batch.column("embedding")
            n = len(vid)
            flat = embs.flatten().to_numpy(zero_copy_only=False)
            if embs.null_count or len(flat) != n * DIM:
                raise ValueError(
                    f"embeddings must be non-null length-{DIM} arrays")
            emb = flat.reshape(n, DIM)
            out_code = np.empty((n, PQ_M), dtype=np.int64)
            out_dist = np.empty((n, PQ_M), dtype=np.float64)
            for m in range(PQ_M):
                x = emb[:, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
                c = cb[:, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
                # ascending-j accumulation == the SQL fold, bit for bit
                acc = np.zeros((n, len(cb_ids)))
                for j in range(PQ_SUBDIM):
                    d = x[:, j:j + 1] - c[:, j][None, :]
                    acc += d * d
                k = np.argmin(acc, axis=1)
                out_code[:, m] = cb_ids[k]
                out_dist[:, m] = acc[np.arange(n), k]
            yield pa.record_batch(
                [pa.array(np.repeat(vid, PQ_M)),
                 pa.array(np.tile(
                     np.arange(1, PQ_M + 1, dtype=np.int32), n)),
                 pa.array(out_code.ravel()),
                 pa.array(out_dist.ravel())],
                names=["vec_id", "m", "code", "dist"],
            )

    return e.select("vec_id", "embedding").mapInArrow(
        kernel, "vec_id long, m int, code long, dist double")


_CODES_CTES = f"""
    sub AS ({_SUB_SQL}),
    cb AS (SELECT m, vec_id AS code, x AS c FROM sub WHERE vec_id < {PQ_CODEBOOK}),
    cand AS (
      SELECT s.vec_id, s.m, cb.code, {_sqdist_sql('s.x', 'cb.c')} AS dist
      FROM sub s JOIN cb ON s.m = cb.m
    ),
    codes AS (
      SELECT vec_id, m, code, dist FROM (
        SELECT vec_id, m, code, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY dist, code) AS rn
        FROM cand
      ) WHERE rn = 1
    )
"""


# ---------------------------------------------------------------- queries

@register(
    "pq_encode_codes",
    f"""
    WITH {_CODES_CTES}
    SELECT vec_id, m, code,
           CAST(ROUND(dist * {_SCALE}, 0) AS BIGINT) AS err_micro
    FROM codes
    """,
    doc=f"PQ encoding: each 64-dim vector compresses to {PQ_M} codes "
        f"(nearest of {PQ_CODEBOOK} codebook entries per 8-dim subspace; "
        "seed codebooks = Lloyd's round 0, so the oracle is exact — "
        "module docstring). err_micro is the fixed-point per-subspace "
        "reconstruction error. Broadcast codebook + map-side-combined "
        "argmin: the corpus is scanned once and never shuffled.",
)
def pq_encode_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _codes_df(spark, sf_dir).select(
        "vec_id", "m", "code",
        F.round(F.col("dist") * _SCALE, 0).cast("long").alias("err_micro"),
    )


def _lut_ctes(qids: tuple[int, ...]) -> str:
    return f"""
    qsub AS (SELECT vec_id AS qid, m, x AS qx FROM sub
             WHERE vec_id IN ({', '.join(map(str, qids))})),
    lut AS (
      SELECT q.qid, cb.m, cb.code,
             CAST(ROUND({_sqdist_sql('q.qx', 'cb.c')} * {_SCALE}, 0)
                  AS BIGINT) AS d_fx
      FROM qsub q JOIN cb ON q.m = cb.m
    )
"""


_LUT_CTES = _lut_ctes(PQ_QUERY_IDS)


def _lut_df(spark: SparkSession, sf_dir: str,
            qids: tuple[int, ...]) -> DataFrame:
    """(qid, m, code, d_fx) — per-query ADC lookup table, fixed-point."""
    sub = _sub_df(spark, sf_dir)
    cb = (
        sub.filter(F.col("vec_id") < PQ_CODEBOOK)
        .select("m", F.col("vec_id").alias("code"), F.col("x").alias("c"))
    )
    qsub = (
        sub.filter(F.col("vec_id").isin(*qids))
        .select(F.col("vec_id").alias("qid"), "m", F.col("x").alias("qx"))
    )
    from tank_spark.util import memo_col

    d_fx = memo_col(("pq_lut_dfx",), lambda: F.round(
        _sqdist_cols("qx", "c") * _SCALE, 0).cast("long"))
    return (
        qsub.join(F.broadcast(cb), "m")
        .select("qid", "m", "code", d_fx.alias("d_fx"))
    )


@register(
    "pq_adc_topk",
    f"""
    WITH {_CODES_CTES}, {_LUT_CTES}
    SELECT qid, vec_id, adc_fx, CAST(rn AS INTEGER) AS rank FROM (
      SELECT l.qid, c.vec_id, CAST(SUM(l.d_fx) AS BIGINT) AS adc_fx,
             ROW_NUMBER() OVER (PARTITION BY l.qid
                                ORDER BY SUM(l.d_fx), c.vec_id) AS rn
      FROM codes c
      JOIN lut l ON l.m = c.m AND l.code = c.code
      WHERE c.vec_id <> l.qid
      GROUP BY l.qid, c.vec_id
    ) WHERE rn <= {PQ_TOPK}
    """,
    doc=f"PQ asymmetric-distance (ADC) top-{PQ_TOPK} for "
        f"{len(PQ_QUERY_IDS)} query vectors: per-query LUT of "
        f"query-subvector-to-codebook distances ({PQ_M}x{PQ_CODEBOOK} "
        "entries, broadcast), approximate distance = integer sum of "
        "fixed-point LUT hits over the byte codes — the compressed-"
        "domain scan a 100 TB ANN serves from. Cross-subspace sums are "
        "BIGINT-exact (llm/search.py idiom).",
)
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    lut = _lut_df(spark, sf_dir, PQ_QUERY_IDS)
    codes = _codes_df(spark, sf_dir).select("vec_id", "m", "code")
    w = Window.partitionBy("qid").orderBy("adc_fx", "vec_id")
    return (
        codes.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(F.sum("d_fx").alias("adc_fx"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("qid", "vec_id", "adc_fx", "rank")
    )


@register(
    "pq_recall_eval",
    f"""
    WITH {_CODES_CTES}, {_LUT_CTES},
    adc AS (
      SELECT qid, vec_id FROM (
        SELECT l.qid, c.vec_id,
               ROW_NUMBER() OVER (PARTITION BY l.qid
                                  ORDER BY SUM(l.d_fx), c.vec_id) AS rn
        FROM codes c
        JOIN lut l ON l.m = c.m AND l.code = c.code
        WHERE c.vec_id <> l.qid
        GROUP BY l.qid, c.vec_id
      ) WHERE rn <= {PQ_TOPK}
    ),
    qfull AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
              WHERE vec_id IN ({', '.join(map(str, PQ_QUERY_IDS))})),
    exact AS (
      SELECT qid, vec_id FROM (
        SELECT q.qid, e.vec_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.qid
                 ORDER BY {_sqdist_sql("list_transform(q.qe, v -> v::DOUBLE)",
                                       "list_transform(e.embedding, v -> v::DOUBLE)",
                                       dim=DIM)},
                          e.vec_id) AS rn
        FROM qfull q JOIN embeddings e ON e.vec_id <> q.qid
      ) WHERE rn <= {PQ_TOPK}
    )
    SELECT exact.qid,
           CAST(COUNT(adc.vec_id) AS BIGINT) AS n_hit,
           CAST(COUNT(*) AS BIGINT) AS k,
           CAST(COUNT(adc.vec_id) AS DOUBLE) / COUNT(*) AS recall_at_k
    FROM exact
    LEFT JOIN adc ON adc.qid = exact.qid AND adc.vec_id = exact.vec_id
    GROUP BY exact.qid
    """,
    doc=f"PQ quality gate: recall@{PQ_TOPK} of the ADC compressed-domain "
        f"top-{PQ_TOPK} against the exact squared-L2 top-{PQ_TOPK}, per "
        "query — the number that decides codebook size / M before "
        "rolling an index out (ivf_recall_eval twin for the PQ regime). "
        "Both rankings are engine-exact, so the recall fractions are "
        "small-integer divisions.",
)
def pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    qfull = (
        vecs.filter(F.col("vec_id").isin(*PQ_QUERY_IDS))
        .select(F.col("vec_id").alias("qid"), F.col("emb").alias("qe"))
    )
    wx = Window.partitionBy("qid").orderBy("dist", "vec_id")
    exact = (
        vecs.join(F.broadcast(qfull))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", _sqdist_cols("qe", "emb").alias("dist"))
        .withColumn("rn", F.row_number().over(wx))
        .filter(F.col("rn") <= PQ_TOPK)
        .select("qid", "vec_id")
    )
    adc = pq_adc_topk(spark, sf_dir).select("qid", "vec_id", F.lit(1).alias("hit"))
    return (
        exact.join(adc, ["qid", "vec_id"], "left")
        .groupBy("qid")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hit"),
            F.count(F.lit(1)).cast("long").alias("k"),
            (F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
             / F.count(F.lit(1))).alias("recall_at_k"),
        )
    )


# ------------------------------------------------------------- training

PQ_KMEANS_ROUNDS = 3


def train_pq_codebooks(spark: SparkSession, sf_dir: str,
                       rounds: int = PQ_KMEANS_ROUNDS) -> DataFrame:
    """Per-subspace Lloyd's k-means, ALL subspaces in one Catalyst plan:
    subvector rows key on (m); the k*M-row codebook broadcasts into the
    assignment join; the update shuffles M*K*SUBDIM mean cells per round
    (never vectors). Returns (m, code, c: array<double>, n_members).

    Init = the seed codebooks (vec_id < PQ_CODEBOOK), so round 0
    reproduces pq_encode_codes exactly; like train_kmeans, centroids are
    localCheckpoint-ed per round to truncate lineage. Rows-only toward
    the driver (float means are not bit-portable); the numpy twin in
    tests/test_pq.py pins values.
    """
    sub = _sub_df(spark, sf_dir)
    cents = (
        sub.filter(F.col("vec_id") < PQ_CODEBOOK)
        .select("m", F.col("vec_id").alias("code"), F.col("x").alias("c"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        cand = (
            sub.join(F.broadcast(cents), "m")
            .select("vec_id", "m", "code", "x",
                    _sqdist_cols("x", "c").alias("dist"))
        )
        assign = cand.groupBy("vec_id", "m").agg(
            F.min_by(F.struct("code", "x"), F.struct("dist", "code")).alias("b")
        ).select("m", F.col("b.code").alias("code"), F.col("b.x").alias("x"))
        dims = (
            assign.select("m", "code", F.posexplode("x").alias("pos", "val"))
            .groupBy("m", "code", "pos")
            .agg(F.avg("val").alias("mean"))
        )
        counts = assign.groupBy("m", "code").agg(
            F.count(F.lit(1)).alias("n_members"))
        cents = (
            dims.groupBy("m", "code")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mean"))),
                lambda s: s["mean"],
            ).alias("c"))
            .join(counts, ["m", "code"])
            .localCheckpoint(eager=True)
        )
    return cents


@register(
    "pq_train_subspace_kmeans",
    None,  # iterative float means are not bit-portable -> rows-only
    doc=f"PQ codebook training: {PQ_KMEANS_ROUNDS} Lloyd's rounds per "
        f"subspace ({PQ_M} subspaces x {PQ_CODEBOOK} codes, one shared "
        "plan). Emits per-(subspace, code) member counts; centroid "
        "values pinned by the numpy twin (tests/test_pq.py).",
)
def pq_train_subspace_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return train_pq_codebooks(spark, sf_dir).select("m", "code", "n_members")


# ------------------------------------------------------ composed index

def _ivf_pq_sql() -> str:
    from tank_spark.llm.similarity import (
        _IVF_QUERY_IDS, N_CENTROIDS, N_PROBE, _dot_sql, _ivf_assign_sql,
    )

    ids = ", ".join(str(i) for i in _IVF_QUERY_IDS)
    dot_vc = _dot_sql("v.embedding", "c.embedding")
    n_c = _dot_sql("c.embedding", "c.embedding")
    return f"""
    WITH {_CODES_CTES}, {_lut_ctes(_IVF_QUERY_IDS)},
    {_ivf_assign_sql()},
    probes AS (
      SELECT qid, centroid_id FROM (
        SELECT v.vec_id AS qid, c.vec_id AS centroid_id,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY -2 * {dot_vc} + {n_c}, c.vec_id) AS prn
        FROM embeddings v JOIN embeddings c ON c.vec_id < {N_CENTROIDS}
        WHERE v.vec_id IN ({ids})
      ) WHERE prn <= {N_PROBE}
    )
    SELECT qid, vec_id, adc_fx, CAST(rn AS INTEGER) AS rank FROM (
      SELECT p.qid, a.vec_id, CAST(SUM(l.d_fx) AS BIGINT) AS adc_fx,
             ROW_NUMBER() OVER (PARTITION BY p.qid
                                ORDER BY SUM(l.d_fx), a.vec_id) AS rn
      FROM probes p
      JOIN assign a ON a.centroid_id = p.centroid_id
      JOIN codes c ON c.vec_id = a.vec_id
      JOIN lut l ON l.qid = p.qid AND l.m = c.m AND l.code = c.code
      WHERE a.vec_id <> p.qid
      GROUP BY p.qid, a.vec_id
    ) WHERE rn <= {PQ_TOPK}
    """


@register(
    "ivf_pq_search",
    _ivf_pq_sql(),
    doc=f"IVF-PQ search — the production 100 TB ANN index shape (FAISS "
        "IVFPQ): the coarse quantizer prunes the corpus to the query's "
        "nprobe inverted lists, and candidates rank by compressed-domain "
        f"ADC distance (integer LUT sums over the {PQ_M}-byte codes) — "
        "full vectors are touched for neither storage nor scoring. "
        "Candidates ~ corpus/centroids * nprobe; the LUT and centroid "
        "tables broadcast; the only shuffle keys on centroid_id "
        "(inverted-list locality — the layout a real deployment "
        "bucket-partitions by).",
)
def ivf_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tank_spark.llm.similarity import (
        _IVF_QUERY_IDS, N_PROBE, _centroid_score_structs,
    )

    e = load(spark, sf_dir, "embeddings")
    # map-only literal-centroid argmin + array_sort probe ranking
    # (see similarity._centroid_score_structs for the exactness proof)
    arr = _centroid_score_structs(spark, sf_dir)
    assign = e.select(
        "vec_id", F.array_min(arr)["centroid_id"].alias("centroid_id")
    )
    probes = (
        e.filter(F.col("vec_id").isin(*_IVF_QUERY_IDS))
        .select(
            F.col("vec_id").alias("qid"),
            F.explode(F.slice(F.array_sort(arr), 1, N_PROBE)).alias("p"),
        )
        .select("qid", F.col("p.centroid_id").alias("centroid_id"))
    )
    codes = _codes_df(spark, sf_dir).select("vec_id", "m", "code")
    lut = _lut_df(spark, sf_dir, _IVF_QUERY_IDS)
    w = Window.partitionBy("qid").orderBy("adc_fx", "vec_id")
    return (
        F.broadcast(probes).join(assign, "centroid_id")
        .filter(F.col("vec_id") != F.col("qid"))
        .join(codes, "vec_id")
        .join(F.broadcast(lut), ["qid", "m", "code"])
        .groupBy("qid", "vec_id")
        .agg(F.sum("d_fx").alias("adc_fx"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("qid", "vec_id", "adc_fx", "rank")
    )

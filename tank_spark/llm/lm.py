"""In-engine n-gram language-model quality scoring over ``documents``.

The CCNet / Gopher pipelines (Wenzek 2020; Rae 2021) score web documents
with an n-gram LM and keep the low-perplexity tail — perplexity is the
single strongest cheap quality signal for web text. This module trains
the LM *inside the engine* (one pass of bigram counting over the corpus)
and scores every document against it in the same Catalyst plan: no
external model artifact, no Python in the hot path.

Engine-exact surprisal (the reason this op can carry a hard DuckDB value
oracle, unlike a textbook float `ln p` sum): with add-one smoothing the
per-bigram probability is the exact rational

    p(w2 | w1) = (c12 + 1) / (c1 + V)

and the bit surprisal floor(-log2 p) = floor(log2((c1 + V) / (c12 + 1)))
is computed WITHOUT any transcendental as

    length(bin((c1 + V) div (c12 + 1))) - 1

(binary-digit count of the integer quotient). Since c1 >= c12 and V >= 1
the quotient is >= 1, and floor(log2(a / b)) == floor(log2(a div b)) for
a >= b > 0 — if 2^k <= a/b then a >= (2^k)b so a div b >= 2^k, and
a div b <= a/b — so the integer form is EXACT, not an approximation of
the floor. Both engines produce identical BIGINTs; the only float in the
result is one final division (single operation, IEEE-identical).

At 100 TB: the token/bigram explode is map-only and fused into the scan;
the count model is two map-side-combined aggregates over the bigram key
(one row per distinct bigram / distinct context — vocabulary-bounded,
zipf-concentrated, NOT corpus-sized); scoring joins the per-doc distinct
bigram table (pre-shrunk by a (doc, w1, w2) partial aggregate) against
the model on the bigram key. Neither model table is forced broadcast —
a web-scale vocabulary has billions of hapax contexts and AQE should
pick the join strategy (same posture as llm/text.py rare_word_fraction).
The exact countDistinct(vocab) is oracle-gated; production at 100 TB
would swap in approx_count_distinct (see approx_sketches_demo) with no
change to the plan shape.

Reference parity: the reference engine (SURVEY.md §2) has no LM scoring
surface — this is part of the training-data-pipeline extension the
driver's north star asks for (same family as llm/text.py quality ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tank_spark.plans.registry import register
from tank_spark.sources.tables import load
from tank_spark.util import local_values_df

_WORD = "[a-z0-9]+"

# curation cutoff: docs at or above this many surprisal bits per bigram
# are flagged (the "weird tail" a perplexity filter drops). The flag
# compares integers (bits_total >= TH * n_bigrams) — engine-exact.
HIGH_SURPRISAL_BITS = 12


@register(
    "lm_surprisal_score",
    f"""
    WITH w AS (
      SELECT doc_id, regexp_extract_all(lower(text), '{_WORD}') AS ws
      FROM documents
    ),
    vocab AS (
      SELECT CAST(COUNT(DISTINCT word) AS BIGINT) AS v
      FROM (SELECT unnest(ws) AS word FROM w)
    ),
    bg AS (
      SELECT doc_id, ws[j] AS w1, ws[j + 1] AS w2
      FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(j)
      WHERE len(ws) >= 2
    ),
    doc_bg AS (
      SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS k
      FROM bg GROUP BY doc_id, w1, w2
    ),
    c12 AS (SELECT w1, w2, SUM(k) AS c12 FROM doc_bg GROUP BY w1, w2),
    c1 AS (SELECT w1, SUM(c12) AS c1 FROM c12 GROUP BY w1),
    bits AS (
      SELECT b.doc_id, b.k,
             CAST(length(bin((c1.c1 + v.v) // (c12.c12 + 1))) - 1
                  AS BIGINT) AS s_bits
      FROM doc_bg b
      JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
      JOIN c1 ON b.w1 = c1.w1
      CROSS JOIN vocab v
    )
    SELECT doc_id,
           CAST(SUM(k) AS BIGINT) AS n_bigrams,
           CAST(SUM(k * s_bits) AS BIGINT) AS bits_total,
           CAST(SUM(k * s_bits) AS DOUBLE) / SUM(k) AS bits_per_bigram,
           CAST(CASE WHEN SUM(k * s_bits) >= {HIGH_SURPRISAL_BITS} * SUM(k)
                     THEN 1 ELSE 0 END AS INTEGER) AS flag_high_surprisal
    FROM bits GROUP BY doc_id
    """,
    doc="Bigram-LM surprisal score per document (CCNet-style perplexity "
        "quality signal, trained in-engine on the corpus itself in the "
        "same plan). Integer bit-surprisal via binary-digit count of the "
        "exact rational's integer quotient — engine-exact, no "
        "transcendentals (module docstring). Docs with < 2 tokens have "
        "no bigrams and drop out, like chunk_documents' empty docs.",
)
def lm_surprisal_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    ws = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_WORD), F.lit(0))
    w = d.select("doc_id", ws.alias("ws"))
    vocab = (
        w.select(F.explode("ws").alias("word"))
        .agg(F.countDistinct("word").cast("long").alias("v"))
    )
    pairs = F.expr(
        "transform(sequence(1, size(ws) - 1), "
        "j -> struct(ws[j - 1] AS w1, ws[j] AS w2))"
    )
    doc_bg = (
        w.filter(F.size("ws") >= 2)
        .select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", "p.w1", "p.w2")
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    c12 = doc_bg.groupBy("w1", "w2").agg(F.sum("k").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    # exact integer quotient -> binary digit count - 1 == floor(log2 ratio)
    s_bits = (
        F.length(F.conv(F.expr("(c1 + v) div (c12 + 1)").cast("string"), 10, 2))
        - 1
    ).cast("long")
    scored = (
        doc_bg.join(c12, ["w1", "w2"])  # model join: AQE picks strategy
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vocab))  # 1-row corpus scalar
        .select("doc_id", "k", s_bits.alias("s_bits"))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("k").cast("long").alias("n_bigrams"),
        F.sum(F.col("k") * F.col("s_bits")).cast("long").alias("bits_total"),
        (F.sum(F.col("k") * F.col("s_bits")).cast("double") / F.sum("k"))
        .alias("bits_per_bigram"),
        (
            F.sum(F.col("k") * F.col("s_bits"))
            >= HIGH_SURPRISAL_BITS * F.sum("k")
        ).cast("int").alias("flag_high_surprisal"),
    )


def _heldout_sql() -> str:
    from tank_spark.llm.mixing import SPLIT_SALT, SPLIT_TRAIN_PCT

    bucket = (
        f"('0x' || substr(md5('{SPLIT_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8))"
        "::UBIGINT % 100"
    )
    return f"""
    WITH w AS (
      SELECT doc_id, regexp_extract_all(lower(text), '{_WORD}') AS ws,
             {bucket} < {SPLIT_TRAIN_PCT} AS is_train
      FROM documents
    ),
    vocab AS (
      SELECT CAST(COUNT(DISTINCT word) AS BIGINT) AS v
      FROM (SELECT unnest(ws) AS word FROM w WHERE is_train)
    ),
    bg AS (
      SELECT doc_id, is_train, ws[j] AS w1, ws[j + 1] AS w2
      FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(j)
      WHERE len(ws) >= 2
    ),
    c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM bg WHERE is_train GROUP BY w1, w2),
    c1 AS (SELECT w1, SUM(c12) AS c1 FROM c12 GROUP BY w1),
    eval_bg AS (
      SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS k
      FROM bg WHERE NOT is_train GROUP BY doc_id, w1, w2
    ),
    bits AS (
      SELECT e.doc_id, e.k,
             CAST(length(bin((COALESCE(c1.c1, 0) + v.v)
                             // (COALESCE(c12.c12, 0) + 1))) - 1
                  AS BIGINT) AS s_bits
      FROM eval_bg e
      LEFT JOIN c12 ON e.w1 = c12.w1 AND e.w2 = c12.w2
      LEFT JOIN c1 ON e.w1 = c1.w1
      CROSS JOIN vocab v
    )
    SELECT doc_id,
           CAST(SUM(k) AS BIGINT) AS n_bigrams,
           CAST(SUM(k * s_bits) AS BIGINT) AS bits_total,
           CAST(SUM(k * s_bits) AS DOUBLE) / SUM(k) AS bits_per_bigram
    FROM bits GROUP BY doc_id
    """


@register(
    "lm_heldout_surprisal",
    _heldout_sql(),
    doc="TRUE held-out perplexity signal (the CCNet configuration): the "
        "bigram model trains ONLY on the train_eval_split 98% train "
        "side and scores ONLY the held-out 2% — generalization "
        "surprisal, with unseen bigrams/contexts smoothing to "
        "(0+1)/(0+V) exactly like lm_cross_source_divergence. The "
        "split is the same salted-hash assignment as "
        "llm/mixing.py:train_eval_split, so membership is stable "
        "under corpus growth and reproducible across engines.",
)
def lm_heldout_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tank_spark.llm.mixing import SPLIT_SALT, SPLIT_TRAIN_PCT

    d = load(spark, sf_dir, "documents")
    h8 = F.substring(
        F.md5(F.concat(F.lit(SPLIT_SALT), F.col("doc_id").cast("string"))),
        1, 8)
    is_train = (F.conv(h8, 16, 10).cast("bigint") % 100) < SPLIT_TRAIN_PCT
    ws = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_WORD), F.lit(0))
    w = d.select("doc_id", ws.alias("ws"), is_train.alias("is_train"))
    vocab = (
        w.filter("is_train").select(F.explode("ws").alias("word"))
        .agg(F.countDistinct("word").cast("long").alias("v"))
    )
    pairs = F.expr(
        "transform(sequence(1, size(ws) - 1), "
        "j -> struct(ws[j - 1] AS w1, ws[j] AS w2))"
    )
    bg = (
        w.filter(F.size("ws") >= 2)
        .select("doc_id", "is_train", F.explode(pairs).alias("p"))
        .select("doc_id", "is_train", "p.w1", "p.w2")
    )
    c12 = (
        bg.filter("is_train").groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    eval_bg = (
        bg.filter(~F.col("is_train"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    s_bits = (
        F.length(F.conv(
            F.expr("(coalesce(c1, 0L) + v) div (coalesce(c12, 0L) + 1)")
            .cast("string"), 10, 2))
        - 1
    ).cast("long")
    scored = (
        eval_bg.join(c12, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", "k", s_bits.alias("s_bits"))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("k").cast("long").alias("n_bigrams"),
        F.sum(F.col("k") * F.col("s_bits")).cast("long").alias("bits_total"),
        (F.sum(F.col("k") * F.col("s_bits")).cast("double") / F.sum("k"))
        .alias("bits_per_bigram"),
    )


@register(
    "lm_cross_source_divergence",
    f"""
    WITH w AS (
      SELECT source, regexp_extract_all(lower(text), '{_WORD}') AS ws
      FROM documents
    ),
    vocab AS (
      SELECT source AS src_t, CAST(COUNT(DISTINCT word) AS BIGINT) AS v
      FROM (SELECT source, unnest(ws) AS word FROM w) GROUP BY source
    ),
    bg AS (
      SELECT source, ws[j] AS w1, ws[j + 1] AS w2
      FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(j)
      WHERE len(ws) >= 2
    ),
    sb AS (
      SELECT source, w1, w2, CAST(COUNT(*) AS BIGINT) AS k
      FROM bg GROUP BY source, w1, w2
    ),
    c1 AS (SELECT source, w1, SUM(k) AS c1 FROM sb GROUP BY source, w1),
    pairs AS (
      SELECT t.src_t, e.source AS src_e, e.w1, e.w2, e.k
      FROM sb e CROSS JOIN (SELECT DISTINCT src_t FROM vocab) t
    ),
    bits AS (
      SELECT p.src_t, p.src_e, p.k,
             CAST(length(bin((COALESCE(c1.c1, 0) + v.v)
                             // (COALESCE(m.k, 0) + 1))) - 1
                  AS BIGINT) AS s_bits
      FROM pairs p
      LEFT JOIN sb m ON m.source = p.src_t AND m.w1 = p.w1 AND m.w2 = p.w2
      LEFT JOIN c1 ON c1.source = p.src_t AND c1.w1 = p.w1
      JOIN vocab v ON v.src_t = p.src_t
    )
    SELECT src_t AS train_source, src_e AS eval_source,
           CAST(SUM(k) AS BIGINT) AS n_bigrams,
           CAST(SUM(k * s_bits) AS BIGINT) AS bits_total,
           CAST(SUM(k * s_bits) AS DOUBLE) / SUM(k) AS bits_per_bigram
    FROM bits GROUP BY src_t, src_e
    """,
    doc="Cross-source LM divergence matrix: each source's bigram model "
        "scores every source's bigram stream (average surprisal bits). "
        "Diagonal = in-domain fit; off-diagonal minus diagonal = domain "
        "mismatch — the Moore-Lewis-style signal mixing pipelines use "
        "to weight or select sources. Unseen bigrams/contexts smooth to "
        "(0+1)/(0+V) via the same exact-rational bit surprisal as "
        "lm_surprisal_score; the #sources fanout is bounded (one row "
        "per (source, bigram type) times #sources), and model joins "
        "key on (train_source, w1[, w2]).",
)
def lm_cross_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    ws = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_WORD), F.lit(0))
    w = d.select("source", ws.alias("ws"))
    vocab = (
        w.select("source", F.explode("ws").alias("word"))
        .groupBy("source")
        .agg(F.countDistinct("word").cast("long").alias("v"))
        .select(F.col("source").alias("src_t"), "v")
    )
    pairs_expr = F.expr(
        "transform(sequence(1, size(ws) - 1), "
        "j -> struct(ws[j - 1] AS w1, ws[j] AS w2))"
    )
    sb = (
        w.filter(F.size("ws") >= 2)
        .select("source", F.explode(pairs_expr).alias("p"))
        .select("source", "p.w1", "p.w2")
        .groupBy("source", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    c1 = sb.groupBy("source", "w1").agg(F.sum("k").alias("c1"))
    train_sources = vocab.select("src_t").distinct()
    pairs = (
        sb.select(F.col("source").alias("src_e"), "w1", "w2", "k")
        .crossJoin(F.broadcast(train_sources))
    )
    model = sb.select(
        F.col("source").alias("src_t"), "w1", "w2", F.col("k").alias("c12")
    )
    ctx = c1.select(F.col("source").alias("src_t"), "w1", "c1")
    s_bits = (
        F.length(F.conv(
            F.expr("(coalesce(c1, 0L) + v) div (coalesce(c12, 0L) + 1)")
            .cast("string"), 10, 2))
        - 1
    ).cast("long")
    scored = (
        pairs.join(model, ["src_t", "w1", "w2"], "left")
        .join(ctx, ["src_t", "w1"], "left")
        .join(F.broadcast(vocab), "src_t")
        .select("src_t", "src_e", "k", s_bits.alias("s_bits"))
    )
    return scored.groupBy("src_t", "src_e").agg(
        F.sum("k").cast("long").alias("n_bigrams"),
        F.sum(F.col("k") * F.col("s_bits")).cast("long").alias("bits_total"),
        (F.sum(F.col("k") * F.col("s_bits")).cast("double") / F.sum("k"))
        .alias("bits_per_bigram"),
    ).select(
        F.col("src_t").alias("train_source"),
        F.col("src_e").alias("eval_source"),
        "n_bigrams", "bits_total", "bits_per_bigram",
    )


# --------------------------------------------------- DSIR data selection

_DSIR_TARGET = "src0"   # the "looks like my curated domain" target slice


def _select_top_quantile(
    scored: DataFrame, order_col: str, id_col: str, q: float,
    accuracy: int = 10000,
) -> DataFrame:
    """Add ``selected`` = 1 for rows whose global ``PERCENT_RANK() OVER
    (ORDER BY order_col, id_col)`` is ``>= q`` — WITHOUT a global window.

    Bit-identical to the window form (same IEEE double percent-rank test,
    same unique (order_col, id_col) ordering) but scale-safe: the
    returned plan is a map-only filter against two literal thresholds.
    The threshold pair is pinned eagerly by the classic distributed-
    selection recipe (bounded driver-side scalars, same posture as the
    BPE merge loop / CC convergence checks):

      1. ``n = count()`` and the smallest selected rank ``k0`` = min r
         with (r-1)/(n-1) >= q evaluated in IEEE double — Python floats
         ARE IEEE doubles, so this matches Spark's percent_rank
         comparison exactly.
      2. ``percentile_approx`` brackets the cut value at quantiles
         q +/- margin (margin = max(4/accuracy, 1e-3), so the band holds
         ~0.2% of rows at accuracy=10000 — ~2M rows per billion, one
         task's worth).
      3. One count job verifies the band really contains rank k0. If
         the approx bound missed (pathological distributions), the
         margin DOUBLES and steps 2-3 repeat — never a whole-relation
         fallback: once the margin covers [0, 1] the bracket is
         (min, max) and verifies unconditionally, so the loop is
         guaranteed to terminate, and each retry costs two more
         bounded jobs while the band stays the smallest verified
         bracket rather than jumping to the full corpus.
      4. The k0-th pair is read off a row_number over the band ONLY
         (single small task, not a global sort).

    Degenerate cases: n <= 1 → percent_rank is 0 → nothing selected for
    q > 0; an all-equal order_col makes the band the whole relation
    (correct, no longer cheap) — callers with adversarial score ties
    should pre-bucket, which unique-id tiebreaks make unnecessary here.
    """
    from pyspark.sql import Window

    # localCheckpoint rather than persist (ADVICE r7: persisted relations
    # here were never unpersisted, so repeated invocations accumulated
    # cache entries for the session's lifetime) — same reuse across the
    # threshold jobs and the returned filter, but checkpoint blocks are
    # reclaimed by the ContextCleaner once the DataFrame is
    # garbage-collected, and the truncated lineage keeps the returned
    # plan a leaf scan + literal filter.
    scored = scored.localCheckpoint(eager=True)
    # Precondition: order_col is non-null (ADVICE r7 — a NULL order value
    # would silently get selected=0 while the PERCENT_RANK window form
    # this claims bit-identity with ranks NULLS FIRST). Checked inside
    # the count job this helper already pays for. The FIRST bracket rides
    # the same job (its quantile bounds depend only on q and accuracy,
    # not on n) — at driver scale each of these whole-relation jobs costs
    # a fixed ~0.15 s of launch latency over the checkpointed leaf, so
    # fusing count+bracket removes one of the helper's four jobs
    # (BENCH r8 DSIR adjudication).
    margin = max(4.0 / accuracy, 1e-3)
    qlo, qhi = max(0.0, q - margin), min(1.0, q + margin)
    cnts = scored.agg(
        F.count(F.lit(1)).alias("n"), F.count(order_col).alias("nn"),
        F.percentile_approx(
            order_col, F.array(F.lit(qlo), F.lit(qhi)), F.lit(accuracy)
        ).alias("b"),
    ).first()
    n = cnts["n"]
    if cnts["nn"] != n:
        raise ValueError(
            f"_select_top_quantile: {n - cnts['nn']} NULL {order_col!r} "
            "values — the percent-rank cut is undefined for NULL scores; "
            "filter or impute them upstream"
        )
    if n <= 1:
        return scored.withColumn(
            "selected", F.lit(1 if q <= 0 else 0).cast("int"))
    r = max(1, int(q * (n - 1)))  # start just below; walk to the cut
    while r <= n and (r - 1) / (n - 1) < q:
        r += 1
    k0 = r
    if k0 > n:
        return scored.withColumn("selected", F.lit(0).cast("int"))
    t_lo, t_hi = cnts["b"]
    while True:
        cnt = scored.agg(
            F.count(F.when(F.col(order_col) < t_lo, 1)).alias("c_lo"),
            F.count(F.when(F.col(order_col) <= t_hi, 1)).alias("c_hi"),
        ).first()
        if cnt["c_lo"] < k0 <= cnt["c_hi"]:
            c_lo, band = cnt["c_lo"], scored.filter(
                (F.col(order_col) >= t_lo) & (F.col(order_col) <= t_hi))
            break
        # Approx bracket missed (pathological distribution): widen and
        # re-bracket. Terminates: at (qlo, qhi) = (0, 1) the bracket is
        # (min, max), where c_lo = 0 < k0 <= n = c_hi always holds.
        assert (qlo, qhi) != (0.0, 1.0), "full-range bracket cannot miss"
        margin *= 2.0
        qlo, qhi = max(0.0, q - margin), min(1.0, q + margin)
        t_lo, t_hi = scored.agg(
            F.percentile_approx(
                order_col, F.array(F.lit(qlo), F.lit(qhi)), F.lit(accuracy)
            ).alias("b")
        ).first()["b"]
    w = Window.orderBy(order_col, id_col)
    thr = (
        band.repartition(1)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == k0 - c_lo)
        .select(order_col, id_col)
        .first()
    )
    sel = (F.col(order_col) > F.lit(float(thr[0]))) | (
        (F.col(order_col) == F.lit(float(thr[0])))
        & (F.col(id_col) >= F.lit(thr[1]))
    )
    return scored.withColumn("selected", sel.cast("int"))


def _select_top_quantile_grouped(
    scored: DataFrame, order_col: str, id_col: str, group_col: str,
    q: float, accuracy: int = 10000,
) -> DataFrame:
    """Grouped form of :func:`_select_top_quantile`: ``selected`` = 1
    where ``PERCENT_RANK() OVER (PARTITION BY group_col ORDER BY
    order_col, id_col) >= q`` — with NO per-group global window (the
    keyed window's scale problem: one partition per group, hot when a
    group holds billions of rows).

    Same recipe per group, batched across groups in whole-relation jobs:
    per-group counts (one aggregate), per-group approx brackets (one
    grouped percentile_approx), one bracket-verification aggregate, one
    band-only window (partitioned by group over ~0.2% of rows), then the
    cut applies as a broadcast threshold join + map-only filter. The
    group count and threshold tables are GROUP-cardinality-bounded
    driver/broadcast scalars — sources/domains number in the hundreds
    even at 100 TB. Groups where the approx bracket misses (pathological
    distributions) are re-bracketed with a doubled margin — only THOSE
    groups, in batched whole-relation jobs like the first pass — until
    every bracket verifies; at margin >= 1 a group's bracket is its
    (min, max) and verifies unconditionally, so no group ever falls back
    to a single-task full-group sort.
    """
    from pyspark.sql import Window

    # localCheckpoint, not persist — see _select_top_quantile (ADVICE r7)
    scored = scored.localCheckpoint(eager=True)
    # Precondition check rides the per-group count job (ADVICE r7: an
    # all-NULL group made percentile_approx return NULL and float(None)
    # crash below; partial NULLs silently diverged from the NULLS-FIRST
    # window ranking this claims bit-identity with).
    cnt_rows = scored.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"), F.count(order_col).alias("nn")
    ).collect()
    bad = {r[0]: r[1] - r[2] for r in cnt_rows if r[1] != r[2]}
    if bad:
        raise ValueError(
            f"_select_top_quantile_grouped: NULL {order_col!r} values in "
            f"groups {sorted(bad)[:5]} — the percent-rank cut is undefined "
            "for NULL scores; filter or impute them upstream"
        )
    ns = {r[0]: r[1] for r in cnt_rows}
    if not ns:
        return scored.withColumn("selected", F.lit(0).cast("int"))

    def k0_of(n: int) -> int | None:
        if n <= 1:
            # percent_rank of a single row is 0 -> selected iff q <= 0
            return 1 if q <= 0 else None
        r = max(1, int(q * (n - 1)))
        while r <= n and (r - 1) / (n - 1) < q:
            r += 1
        return r if r <= n else None

    k0s = {g: k0_of(n) for g, n in ns.items()}
    sel_false = F.lit(0).cast("int")
    todo = [g for g in ns if k0s[g]]
    if not todo:  # every group degenerate (n <= 1 or q above top)
        return scored.withColumn("selected", sel_false)
    spark = scored.sparkSession
    gt = scored.schema[group_col].dataType.simpleString()
    it = scored.schema[id_col].dataType.simpleString()
    margin = max(4.0 / accuracy, 1e-3)
    rows = []  # (g, lo, hi, k_band) once g's bracket verifies
    while todo:
        qlo, qhi = max(0.0, q - margin), min(1.0, q + margin)
        sub = scored.filter(F.col(group_col).isin(todo))
        br = {
            r[0]: (float(r[1][0]), float(r[1][1]))
            for r in sub.groupBy(group_col).agg(
                F.percentile_approx(
                    order_col, F.array(F.lit(qlo), F.lit(qhi)),
                    F.lit(accuracy),
                ).alias("b")
            ).collect()
        }
        bounds = [(g, br[g][0], br[g][1]) for g in todo]
        bdf = local_values_df(
            spark, bounds, f"{group_col} {gt}, lo double, hi double")
        cnt = {
            r[0]: (r[1], r[2])
            for r in sub.join(F.broadcast(bdf), group_col)
            .groupBy(group_col).agg(
                F.count(F.when(F.col(order_col) < F.col("lo"), 1))
                .alias("c_lo"),
                F.count(F.when(F.col(order_col) <= F.col("hi"), 1))
                .alias("c_hi"),
            ).collect()
        }
        missed = []
        for g, lo, hi in bounds:
            c_lo, c_hi = cnt[g]
            k0 = k0s[g]
            if c_lo < k0 <= c_hi:
                rows.append((g, lo, hi, k0 - c_lo))
            else:
                missed.append(g)
        # Terminates per group: at (qlo, qhi) = (0, 1) the bracket is
        # that group's (min, max), where c_lo = 0 < k0 <= n = c_hi.
        assert not missed or (qlo, qhi) != (0.0, 1.0), \
            "full-range bracket cannot miss"
        todo = missed
        margin *= 2.0
    bdf = local_values_df(
        spark, rows, f"{group_col} {gt}, lo double, hi double, k_band long")
    band = scored.join(F.broadcast(bdf), group_col).filter(
        (F.col(order_col) >= F.col("lo")) & (F.col(order_col) <= F.col("hi")))
    w = Window.partitionBy(group_col).orderBy(order_col, id_col)
    thr_rows = (
        band.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == F.col("k_band"))
        .select(group_col, F.col(order_col).alias("_thr_v"),
                F.col(id_col).alias("_thr_id"))
        .collect()  # one row per group — bounded, like the counts above
    )
    thr = local_values_df(
        spark, [(r[0], float(r[1]), r[2]) for r in thr_rows],
        f"{group_col} {gt}, _thr_v double, _thr_id {it}",
    )
    out = scored.join(F.broadcast(thr), group_col, "left")
    sel = (
        F.col("_thr_v").isNotNull()
        & ((F.col(order_col) > F.col("_thr_v"))
           | ((F.col(order_col) == F.col("_thr_v"))
              & (F.col(id_col) >= F.col("_thr_id"))))
    )
    return out.withColumn("selected", sel.cast("int")).drop("_thr_v", "_thr_id")


def _rank_cut_pairs(
    scored: DataFrame, order_col: str, id_col: str, qs: tuple[float, ...],
    accuracy: int = 10000,
) -> tuple[DataFrame, dict[float, tuple[float, object] | None]]:
    """Pin, for each quantile q in ``qs``, the exact ``(value, id)`` pair
    at the smallest ``PERCENT_RANK() OVER (ORDER BY order_col, id_col)``
    >= q — the multi-cut generalization of :func:`_select_top_quantile`
    (same recipe, same PERCENT_RANK bit-identity), batched so the
    whole-relation job count does NOT scale with ``len(qs)``: one count,
    then per retry round ONE ``percentile_approx`` over every pending
    cut's bracket bounds and ONE verification aggregate; only cuts whose
    approx bracket missed re-bracket with a doubled margin (never a
    whole-relation fallback — at margin >= 1 a bracket is (min, max) and
    verifies unconditionally). Each verified cut then reads its boundary
    pair off a row_number over its ~0.2% band only.

    Returns ``(checkpointed_scored, {q: (value, id) | None})`` — None
    when no row passes that cut (n <= 1 with q > 0, or k0 > n). Callers
    build map-only bucket/flag expressions against the literal pairs;
    monotone qs yield monotone pairs under the (order_col, id_col) total
    order, so "count of cuts passed" equals the quantile-bucket index.
    """
    from pyspark.sql import Window

    scored = scored.localCheckpoint(eager=True)
    cnts = scored.agg(
        F.count(F.lit(1)).alias("n"), F.count(order_col).alias("nn")
    ).first()
    n = cnts["n"]
    if cnts["nn"] != n:
        raise ValueError(
            f"_rank_cut_pairs: {n - cnts['nn']} NULL {order_col!r} values "
            "— the percent-rank cuts are undefined for NULL scores; "
            "filter or impute them upstream"
        )
    out: dict[float, tuple[float, object] | None] = {}
    if n <= 1:
        for q in qs:
            out[q] = None if q > 0 else (None if n == 0 else tuple(
                scored.select(order_col, id_col).first()))
        return scored, out
    k0s: dict[float, int] = {}
    for q in qs:
        r = max(1, int(q * (n - 1)))
        while r <= n and (r - 1) / (n - 1) < q:
            r += 1
        if r > n:
            out[q] = None
        else:
            k0s[q] = r
    margin = {q: max(4.0 / accuracy, 1e-3) for q in k0s}
    bands: dict[float, tuple[float, float, int]] = {}  # q -> (lo, hi, k_band)
    todo = sorted(k0s)
    while todo:
        bounds = {
            q: (max(0.0, q - margin[q]), min(1.0, q + margin[q])) for q in todo
        }
        flat = [b for q in todo for b in bounds[q]]
        bvals = scored.agg(
            F.percentile_approx(
                order_col, F.array(*[F.lit(x) for x in flat]), F.lit(accuracy)
            ).alias("b")
        ).first()["b"]
        brackets = {
            q: (float(bvals[2 * i]), float(bvals[2 * i + 1]))
            for i, q in enumerate(todo)
        }
        cnt = scored.agg(*[
            c for i, q in enumerate(todo) for c in (
                F.count(F.when(F.col(order_col) < brackets[q][0], 1))
                .alias(f"lo_{i}"),
                F.count(F.when(F.col(order_col) <= brackets[q][1], 1))
                .alias(f"hi_{i}"),
            )
        ]).first()
        missed = []
        for i, q in enumerate(todo):
            c_lo, c_hi = cnt[2 * i], cnt[2 * i + 1]
            if c_lo < k0s[q] <= c_hi:
                bands[q] = (brackets[q][0], brackets[q][1], k0s[q] - c_lo)
            else:
                assert bounds[q] != (0.0, 1.0), "full-range bracket cannot miss"
                margin[q] *= 2.0
                missed.append(q)
        todo = missed
    w = Window.orderBy(order_col, id_col)
    for q, (lo, hi, k_band) in bands.items():
        thr = (
            scored.filter((F.col(order_col) >= lo) & (F.col(order_col) <= hi))
            .repartition(1)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == k_band)
            .select(order_col, id_col)
            .first()
        )
        out[q] = (float(thr[0]), thr[1])
    return scored, out


# Curriculum staging: quartile cuts on the shared quality score. Stage 0
# holds the lowest-quality quarter, stage 3 the highest — the standard
# easy->hard (or noisy->clean) curriculum axis — and shuffle_key gives a
# deterministic within-stage training order (salted md5, the mixing.py
# u-variate idiom), so a resumed 100 TB ordering job reproduces the
# exact same epoch order without any stored RNG state.
CURRICULUM_QS = (0.25, 0.5, 0.75)
_CURR_SALT = "curriculum:"


def _curriculum_sql() -> str:
    from tank_spark.llm.text import QUALITY_SQL

    return f"""
    WITH scored AS (SELECT doc_id, {QUALITY_SQL} AS quality FROM documents),
    pr AS (
      SELECT doc_id,
             PERCENT_RANK() OVER (ORDER BY quality, doc_id) AS pr
      FROM scored
    )
    SELECT doc_id,
           CAST(CASE WHEN pr >= 0.75 THEN 3 WHEN pr >= 0.5 THEN 2
                     WHEN pr >= 0.25 THEN 1 ELSE 0 END AS INTEGER) AS stage,
           CAST(('0x' || substr(md5('{_CURR_SALT}' || CAST(doc_id AS VARCHAR)),
                 1, 8))::UBIGINT AS BIGINT) AS shuffle_key
    FROM pr
    """


@register(
    "curriculum_quality_stages",
    _curriculum_sql(),
    doc="Curriculum ordering for training: every document gets a stage "
        "(global quality QUARTILE — exact PERCENT_RANK semantics incl. "
        "ties, oracle twin is the window form) plus a deterministic "
        "salted-md5 shuffle_key for within-stage order. Scale posture: "
        "the quartile thresholds come from the batched approx-bracket "
        "recipe (_rank_cut_pairs — one count + one bracket aggregate, "
        "band-only windows), so the returned plan is a MAP-ONLY "
        "projection against six literals: no global window, no sort, no "
        "shuffle at any corpus size. A training job ORDERs BY (stage, "
        "shuffle_key) downstream; the key is reproducible across resumes "
        "with no stored RNG state (mixing.py u-variate idiom).",
)
def curriculum_quality_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tank_spark.llm.text import quality_col

    d = load(spark, sf_dir, "documents")
    scored, cuts = _rank_cut_pairs(
        d.select("doc_id", quality_col().alias("quality")),
        "quality", "doc_id", CURRICULUM_QS,
    )
    stage = F.lit(0)
    for q in CURRICULUM_QS:
        pair = cuts[q]
        if pair is None:
            continue
        v, i = pair
        stage = stage + (
            (F.col("quality") > F.lit(v))
            | ((F.col("quality") == F.lit(v)) & (F.col("doc_id") >= F.lit(i)))
        ).cast("int")
    h8 = F.substring(
        F.md5(F.concat(F.lit(_CURR_SALT), F.col("doc_id").cast("string"))), 1, 8
    )
    return scored.select(
        "doc_id",
        stage.cast("int").alias("stage"),
        F.conv(h8, 16, 10).cast("bigint").alias("shuffle_key"),
    )


@register(
    "dsir_importance_weights",
    f"""
    WITH words AS (
      SELECT doc_id, source, unnest(regexp_extract_all(lower(text), '{_WORD}')) AS word
      FROM documents
    ),
    doc_w AS (
      SELECT doc_id, source, word, CAST(COUNT(*) AS BIGINT) AS k
      FROM words GROUP BY doc_id, source, word
    ),
    cr AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c_r FROM words GROUP BY word),
    ct AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c_t FROM words
           WHERE source = '{_DSIR_TARGET}' GROUP BY word),
    scal AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_r,
             CAST(COUNT(*) FILTER (WHERE source = '{_DSIR_TARGET}') AS BIGINT) AS n_t,
             CAST(COUNT(DISTINCT word) AS BIGINT) AS v
      FROM words
    ),
    bits AS (
      SELECT d.doc_id, d.source, d.k,
             CAST(length(bin((s.n_t + s.v) // (COALESCE(ct.c_t, 0) + 1))) - 1
                  AS BIGINT) AS s_t,
             CAST(length(bin((s.n_r + s.v) // (cr.c_r + 1))) - 1
                  AS BIGINT) AS s_r
      FROM doc_w d
      JOIN cr ON d.word = cr.word
      LEFT JOIN ct ON d.word = ct.word
      CROSS JOIN scal s
    ),
    agg AS (
      SELECT doc_id, source,
             CAST(SUM(k) AS BIGINT) AS n_words,
             CAST(SUM(k * s_t) AS BIGINT) AS bits_target,
             CAST(SUM(k * s_r) AS BIGINT) AS bits_raw,
             CAST(SUM(k * s_r) - SUM(k * s_t) AS BIGINT) AS weight_bits
      FROM bits GROUP BY doc_id, source
    )
    SELECT doc_id, source, n_words, bits_target, bits_raw, weight_bits,
           CAST(weight_bits AS DOUBLE) / n_words AS weight_per_word,
           CAST(CASE WHEN PERCENT_RANK() OVER (
                    ORDER BY CAST(weight_bits AS DOUBLE) / n_words, doc_id)
                          >= 0.8 THEN 1 ELSE 0 END AS INTEGER) AS selected
    FROM agg
    """,
    doc="DSIR-style importance weighting for data selection (Xie et al. "
        "2023, 'Data Selection for Language Models via Importance "
        "Resampling'): score every document by how much more likely its "
        "unigrams are under a TARGET-domain model (here the "
        f"'{_DSIR_TARGET}' source slice) than under the raw-corpus "
        "model — log w(x) = sum_f k_f (log p_t(f) - log p_raw(f)), "
        "realized engine-exactly as the integer bit-surprisal difference "
        "with add-one smoothing over the shared vocabulary (same "
        "digit-count-of-integer-quotient trick as lm_surprisal_score; "
        "no transcendentals, hard value oracle). selected=1 marks the "
        "top-20% weighted docs — the deterministic form of DSIR's "
        "weight-proportional resampling, computed scale-safely via "
        "_select_top_quantile (approx-quantile band + exact boundary "
        "refinement + map-only filter; the oracle keeps the equivalent "
        "global PERCENT_RANK form). Scale shape: "
        "both models ride ONE vocabulary-bounded word aggregate (map-"
        "side-combined; target counts as a conditional sum, so no "
        "second shuffle); the three corpus scalars are exact integer "
        "folds of that model table, pinned driver-side and inlined as "
        "literals; the scoring join keys on word and AQE picks the "
        "strategy (zipf-concentrated model table, same posture as "
        "lm_surprisal_score).",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    ws = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_WORD), F.lit(0))
    words = d.select("doc_id", "source", F.explode(ws).alias("word"))
    # doc_w's shuffle feeds both the model table and the scoring join,
    # but everything below lands in ONE materialization job (the
    # helper's eager checkpoint), where ReuseExchange dedups the shared
    # shuffle — so the r7/r8 persist (and its cache-write cost plus the
    # ADVICE r7 unpersist bookkeeping) is gone; A/B at sf0.1 showed
    # no-persist is the faster shape (tools/ DSIR adjudication, r9).
    doc_w = (
        words.groupBy("doc_id", "source", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    is_t = F.col("source") == _DSIR_TARGET
    # ONE vocabulary-bounded model table carries both unigram models:
    # c_t as a conditional sum in the same groupBy (0 where the target
    # slice lacks the word — identical to the old left-join
    # coalesce(c_t, 0)). The r8 shape shuffled doc_w three extra times
    # (separate cr / ct aggregates + a countDistinct inside scal); this
    # folds them into a single word-shuffle, and the corpus scalars
    # become exact integer folds of the model table (n_r = sum c_r,
    # n_t = sum c_t, v = count(*)) computed as a broadcast 1-row
    # crossJoin inside the SAME materialization job — no extra driver
    # round-trip, and the shared word-shuffle is deduped by
    # ReuseExchange (BENCH r8 DSIR adjudication: at driver SF the cost
    # was fixed per-job latency, not scan work, so fewer jobs win; at
    # 100 TB the saved doc_w-sized shuffles win).
    model = doc_w.groupBy("word").agg(
        F.sum("k").cast("long").alias("c_r"),
        F.sum(F.when(is_t, F.col("k")).otherwise(F.lit(0)))
        .cast("long").alias("c_t"),
    )
    scal = model.agg(
        F.sum("c_r").cast("long").alias("n_r"),
        F.sum("c_t").cast("long").alias("n_t"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )

    def digits(q):  # floor(log2 .) of an integer quotient, engine-exact
        return (F.length(F.conv(q.cast("string"), 10, 2)) - 1).cast("long")

    s_t = digits(F.expr("(n_t + v) div (c_t + 1)"))
    s_r = digits(F.expr("(n_r + v) div (c_r + 1)"))
    scored = (
        doc_w.join(model, "word")
        .crossJoin(F.broadcast(scal))
        .select("doc_id", "source", "k", s_t.alias("s_t"), s_r.alias("s_r"))
    )
    bt = F.sum(F.col("k") * F.col("s_t"))
    br = F.sum(F.col("k") * F.col("s_r"))
    agg = scored.groupBy("doc_id", "source").agg(
        F.sum("k").cast("long").alias("n_words"),
        bt.cast("long").alias("bits_target"),
        br.cast("long").alias("bits_raw"),
        (br - bt).cast("long").alias("weight_bits"),
    )
    # DSIR keeps a target-budget's worth of the highest-weighted docs
    # (resampling by weight); the deterministic engine form is a top-
    # quantile cut on the PER-WORD weight (the raw sum anti-selects long
    # docs — measured at sf0.01: per-word ranking picks target-source
    # docs at 0.44 vs 0.19 elsewhere, the raw sum inverted that).
    # The cut is the SCALE-SAFE selection (VERDICT r6 #2): an approx-
    # quantile band plus exact boundary refinement pins the threshold
    # pair, then the flag is a map-only filter — bit-identical to the
    # oracle's global PERCENT_RANK() but with no global window / single-
    # partition sort in the returned plan (_select_top_quantile).
    agg = agg.withColumn(
        "weight_per_word",
        F.col("weight_bits").cast("double") / F.col("n_words"),
    )
    return _select_top_quantile(agg, "weight_per_word", "doc_id", 0.8)

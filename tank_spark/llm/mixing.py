"""Corpus mixing for training-data pipelines: deterministic stratified
sampling across sources, and token-budget sequence packing.

Both are the operations that turn a filtered/deduped document pool into
an actual training mix: per-source sampling rates implement the data-mix
recipe (web 10%, code 50%, curated 100%, ...), and packing assigns every
document a position in the fixed-length token-sequence stream a trainer
consumes.

Scale posture (100 TB):
- Sampling is a map-only filter fused into the scan — zero shuffles,
  trivially parallel, and *deterministic*: membership is a pure function
  of doc_id (md5-derived uniform), so re-runs, resumed jobs, and
  downstream audits all see the same sample without any persisted state.
- Packing is one window shuffle keyed on source. Production pins the
  unit of packing to (source, shard) — shard = a bounded doc_id bucket —
  so no single window partition exceeds a worker; the arithmetic is
  unchanged. Token offsets are exact integer running sums: every engine
  agrees bit-for-bit, and a document's (seq_first, seq_last) span is
  reproducible from the table alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tank_spark.plans.registry import register
from tank_spark.sources.tables import load

# ------------------------------------------------------------- sampling

# The data-mix recipe: sampling rate per source group. Groups are spelled
# out as literals so the Spark and DuckDB expressions are generated from
# the same spec (no drift).
RATE_GROUPS: tuple[tuple[float, tuple[str, ...]], ...] = (
    (1.0, ("src0", "src1", "src2", "src3")),
    (0.5, ("src4", "src5", "src6", "src7")),
    (0.25, ("src8", "src9", "src10", "src11")),
)
DEFAULT_RATE = 0.1

# u in [0, 1): first 8 md5 hex chars of a salted doc_id, scaled by 2^32.
# Both engines hash identical bytes and divide exact integers, so the
# double is bit-identical — the sample is engine-independent.
_U_SALT = "mix:"


def _rate_col() -> F.Column:
    rate = None
    for r, sources in RATE_GROUPS:
        cond = F.col("source").isin(*sources)
        rate = F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
    return rate.otherwise(F.lit(DEFAULT_RATE))


def _rate_sql() -> str:
    whens = " ".join(
        "WHEN source IN ({}) THEN {}".format(
            ", ".join(f"'{s}'" for s in sources), r
        )
        for r, sources in RATE_GROUPS
    )
    return f"CASE {whens} ELSE {DEFAULT_RATE} END"


def _u_col() -> F.Column:
    h8 = F.substring(F.md5(F.concat(F.lit(_U_SALT), F.col("doc_id").cast("string"))), 1, 8)
    return F.conv(h8, 16, 10).cast("bigint") / F.lit(4294967296.0)


_U_SQL = (
    f"('0x' || substr(md5('{_U_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT"
    " / 4294967296.0"
)


SPLIT_SALT = "split:"
SPLIT_TRAIN_PCT = 98   # buckets 0..97 train, 98 valid, 99 test


@register(
    "train_eval_split",
    f"""
    SELECT doc_id, source,
           CAST(('0x' || substr(md5('{SPLIT_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                % 100 AS BIGINT) AS bucket,
           CASE
             WHEN ('0x' || substr(md5('{SPLIT_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                  % 100 < {SPLIT_TRAIN_PCT} THEN 'train'
             WHEN ('0x' || substr(md5('{SPLIT_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                  % 100 = {SPLIT_TRAIN_PCT} THEN 'valid'
             ELSE 'test'
           END AS split
    FROM documents
    """,
    doc=f"Deterministic train/valid/test assignment: salted-md5 hash "
        f"bucket mod 100 -> {SPLIT_TRAIN_PCT}/1/1 split. Hash-based (not "
        "row-number) so the assignment is stable under repartitioning, "
        "ingestion order, and incremental appends — a doc's split never "
        "changes as the corpus grows, which is what keeps eval sets "
        "uncontaminated across dataset versions. Map-only, no shuffle; "
        "salted so the split hash is independent of the sampling hash "
        "(sample_stratified_sources), avoiding correlated selection.",
)
def train_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    h8 = F.substring(
        F.md5(F.concat(F.lit(SPLIT_SALT), F.col("doc_id").cast("string"))), 1, 8)
    bucket = (F.conv(h8, 16, 10).cast("bigint") % 100).alias("bucket")
    split = (
        F.when(F.col("bucket") < SPLIT_TRAIN_PCT, "train")
        .when(F.col("bucket") == SPLIT_TRAIN_PCT, "valid")
        .otherwise("test")
    )
    return d.select("doc_id", "source", bucket).withColumn("split", split)



@register(
    "sample_stratified_sources",
    f"""
    SELECT doc_id, source, CAST({_rate_sql()} AS DOUBLE) AS rate,
           CAST(1.0 / ({_rate_sql()}) AS DOUBLE) AS weight
    FROM documents
    WHERE {_U_SQL} < {_rate_sql()}
    """,
    doc="Deterministic stratified sampling: keep a doc iff its md5-derived "
        "uniform falls under its source's mix rate; weight = 1/rate for "
        "unbiased downstream stats. Map-only, no shuffle, reproducible.",
)
def sample_stratified_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    rate = _rate_col()
    return (
        d.filter(_u_col() < rate)
        .select(
            "doc_id", "source", rate.alias("rate"),
            (F.lit(1.0) / rate).cast("double").alias("weight"),
        )
    )


# -------------------------------------------------------------- packing

SEQ_BUDGET = 256  # tokens per training sequence (checked configuration)

_NTOK_SQL = r"len(regexp_extract_all(text, '\S+'))"


@register(
    "pack_token_budget",
    f"""
    WITH tok AS (
      -- 0-token docs occupy no sequence; excluding them also dodges the
      -- Spark-DIV (truncate) vs DuckDB-// (floor) divergence at
      -- start_off + n_tokens - 1 = -1
      SELECT doc_id, source, {_NTOK_SQL} AS n_tokens FROM documents
      WHERE {_NTOK_SQL} > 0
    ),
    off AS (
      SELECT doc_id, source, n_tokens,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_off
      FROM tok
    )
    SELECT doc_id, source, n_tokens, start_off,
           start_off // {SEQ_BUDGET} AS seq_first,
           (start_off + n_tokens - 1) // {SEQ_BUDGET} AS seq_last,
           (start_off + n_tokens - 1) // {SEQ_BUDGET}
             - start_off // {SEQ_BUDGET} + 1 AS n_seqs
    FROM off
    """,
    doc=f"GPT-style sequence packing: concatenate each source's doc stream "
        f"in doc_id order and chunk into {SEQ_BUDGET}-token sequences; "
        "every doc gets its exact token offset and the sequence span it "
        "lands in (docs straddle boundaries, as trainers pack them). One "
        "window shuffle on source; production shards the window key.",
)
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0))).cast("long")
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tok = (
        d.select("doc_id", "source", n_tokens.alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
    )
    off = tok.withColumn(
        "start_off", (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    )
    seq_first = F.expr(f"start_off DIV {SEQ_BUDGET}")
    seq_last = F.expr(f"(start_off + n_tokens - 1) DIV {SEQ_BUDGET}")
    return off.select(
        "doc_id", "source", "n_tokens", "start_off",
        seq_first.alias("seq_first"),
        seq_last.alias("seq_last"),
        (seq_last - seq_first + 1).alias("n_seqs"),
    )


@register(
    "global_sequence_ids",
    """
    SELECT doc_id, source,
           ROW_NUMBER() OVER (ORDER BY source, doc_id) - 1 AS seq_id
    FROM documents
    """,
    doc="Dense global ordinal over (source, doc_id) WITHOUT a global "
        "single-partition window: per-source row_number (distributed) + "
        "driver-side cumulative offsets over the tiny per-source counts — "
        "the scale-safe zipWithIndex for exporting an ordered dataset. "
        "Oracle = the naive global ROW_NUMBER.",
)
def global_sequence_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    counts = {
        r["source"]: r["n"]
        for r in d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for s in sorted(counts):
        offsets[s] = acc
        acc += counts[s]
    off_df = local_values_df(
        spark, list(offsets.items()), "source string, _off long"
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        d.join(F.broadcast(off_df), "source")
        .select(
            "doc_id", "source",
            (F.row_number().over(w) - 1 + F.col("_off")).cast("long").alias("seq_id"),
        )
    )


# -------------------------------------------------------- decontamination

EVAL_MOD = 97  # doc_id % EVAL_MOD == 0 -> held-out eval split (~1%)


@register(
    "decontaminate_train_eval",
    f"""
    WITH corpus AS (SELECT doc_id AS cid, text FROM documents),
    shingled AS (
      SELECT cid, unnest(list_transform(
               generate_series(1, GREATEST(len(w) - 2, 0)),
               j -> w[j] || ' ' || w[j+1] || ' ' || w[j+2])) AS shingle
      FROM (SELECT cid, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
            FROM corpus)
    ),
    ds AS (SELECT DISTINCT cid, shingle FROM shingled),
    ev AS (SELECT cid AS ecid, shingle FROM ds WHERE cid % {EVAL_MOD} = 0),
    tr AS (SELECT cid, shingle FROM ds WHERE cid % {EVAL_MOD} <> 0)
    SELECT tr.cid AS doc_id,
           COUNT(DISTINCT ev.ecid) AS n_eval_docs,
           COUNT(DISTINCT tr.shingle) AS n_shared_shingles
    FROM tr JOIN ev ON tr.shingle = ev.shingle
    GROUP BY tr.cid
    """,
    doc="Eval-set decontamination: flag every training doc sharing a "
        "3-word shingle with the held-out split (doc_id % 97 == 0), with "
        "how many eval docs and distinct shingles it collides on. The "
        "standard pre-training hygiene pass; the eval shingle set is tiny "
        "and broadcast, so the scan stays map-side.",
)
def decontaminate_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tank_spark.llm.dedup import _shingles_df

    d = load(spark, sf_dir, "documents")
    c = d.select(F.col("doc_id").alias("cid"), "text")
    ds = _shingles_df(c).distinct()
    ev = (
        ds.filter(F.col("cid") % EVAL_MOD == 0)
        .select(F.col("cid").alias("ecid"), "shingle")
    )
    tr = ds.filter(F.col("cid") % EVAL_MOD != 0)
    return (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy(F.col("cid").alias("doc_id"))
        .agg(
            F.countDistinct("ecid").alias("n_eval_docs"),
            F.countDistinct("shingle").alias("n_shared_shingles"),
        )
    )


# ---------------------------------------------------- end-to-end pipeline

_NORM_FP_SQL = "md5(lower(regexp_replace(text, '\\s+', ' ', 'g')))"

# shared formula + keep threshold (0.3: the corpus max is ~0.43, so any
# higher cut silently empties the pipeline and its oracle check)
from tank_spark.llm.text import QUALITY_MIN, QUALITY_SQL  # noqa: E402
from tank_spark.util import local_values_df


@register(
    "training_mix_pipeline",
    f"""
    WITH q AS (
      SELECT doc_id, source, text,
             {QUALITY_SQL} AS quality,
             {_NORM_FP_SQL} AS fp
      FROM documents
    ),
    qf AS (SELECT * FROM q WHERE quality >= {QUALITY_MIN}),
    dedup AS (
      SELECT qf.* FROM qf
      JOIN (SELECT fp, MIN(doc_id) AS doc_id FROM qf GROUP BY fp) s
        ON qf.fp = s.fp AND qf.doc_id = s.doc_id
    ),
    samp AS (
      SELECT doc_id, source, quality, text FROM dedup
      WHERE {_U_SQL} < {_rate_sql()}
    ),
    tok AS (
      SELECT doc_id, source, quality, {_NTOK_SQL} AS n_tokens FROM samp
    ),
    off AS (
      SELECT doc_id, source, quality, n_tokens,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_off
      FROM tok
    )
    SELECT doc_id, source, quality, n_tokens, start_off,
           start_off // {SEQ_BUDGET} AS seq_first
    FROM off
    """,
    doc="The whole training-data pipeline as ONE declarative plan: quality "
        "filter -> exact-dedup survivors -> stratified mix sample -> "
        "sequence packing. Catalyst fuses the filter/sample stages into "
        "the scan; the only shuffles are the dedup fingerprint aggregate/"
        "join and the packing window.",
)
def training_mix_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tank_spark.llm.text import quality_col

    d = load(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.regexp_replace("text", r"\s+", " ")))
    q = d.select(
        "doc_id", "source", "text",
        quality_col().alias("quality"), fp.alias("fp"),
    ).filter(F.col("quality") >= QUALITY_MIN)
    # survivors via aggregate + equi-join (map-side combinable; a window
    # over fp would pile every copy of one boilerplate fingerprint onto
    # a single sorted task at 100 TB — AQE skew-split handles the join)
    survivors = q.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    dedup = q.join(survivors, ["fp", "doc_id"])
    samp = dedup.filter(_u_col() < _rate_col())
    n_tokens = F.size(F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0))).cast("long")
    tok = samp.select("doc_id", "source", "quality", n_tokens.alias("n_tokens"))
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    off = tok.withColumn(
        "start_off", (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    )
    return off.select(
        "doc_id", "source", "quality", "n_tokens", "start_off",
        F.expr(f"start_off DIV {SEQ_BUDGET}").alias("seq_first"),
    )


# ------------------------------------------------------ budget planning

# integer mix weights (rate x100) so the weight total is exact in both
# engines (a float sum over sources would be accumulation-order-dependent)
TOKEN_BUDGET_TOTAL = 2_000_000

_W_SQL = (
    "CASE "
    + " ".join(
        "WHEN source IN ({}) THEN {}".format(
            ", ".join(f"'{s}'" for s in sources), int(r * 100)
        )
        for r, sources in RATE_GROUPS
    )
    + f" ELSE {int(DEFAULT_RATE * 100)} END"
)


def _w_col() -> F.Column:
    w = None
    for r, sources in RATE_GROUPS:
        cond = F.col("source").isin(*sources)
        lit = F.lit(int(r * 100))
        w = F.when(cond, lit) if w is None else w.when(cond, lit)
    return w.otherwise(F.lit(int(DEFAULT_RATE * 100)))


@register(
    "token_budget_planning",
    f"""
    WITH per_src AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM({_NTOK_SQL}) AS BIGINT) AS n_tokens_avail,
             {_W_SQL} AS w
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(w) AS w_total FROM per_src)
    SELECT source, n_docs, n_tokens_avail, w,
           CAST(CAST({TOKEN_BUDGET_TOTAL} AS DECIMAL(38,0)) * w AS DOUBLE)
             / w_total AS target_tokens,
           (CAST(CAST({TOKEN_BUDGET_TOTAL} AS DECIMAL(38,0)) * w AS DOUBLE)
             / w_total) / n_tokens_avail AS epochs
    FROM per_src, tot
    """,
    doc=f"Mix planning for a {TOKEN_BUDGET_TOTAL}-token training budget: "
        "per-source token inventory, the budget share its mix weight "
        "earns, and the epoch factor (>1 = the source must repeat to "
        "fill its share — the up-sampling signal; <1 = subsample). One "
        "map-side-combined aggregate plus a broadcast 1-row total; "
        "weights are exact integers so every engine agrees bit-for-bit. "
        "The budget-times-weight product runs in DECIMAL(38,0), so a "
        "petabyte-scale budget constant can't wrap int64.",
)
def token_budget_planning(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    ntok = F.size(F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0)))
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ntok).cast("bigint").alias("n_tokens_avail"),
    ).withColumn("w", _w_col())
    tot = per_src.agg(F.sum("w").alias("w_total"))
    target = (
        F.lit(TOKEN_BUDGET_TOTAL).cast("decimal(38,0)") * F.col("w")
    ).cast("double") / F.col("w_total")
    return (
        per_src.crossJoin(F.broadcast(tot))  # 1-row total
        .select(
            "source", "n_docs", "n_tokens_avail", "w",
            target.alias("target_tokens"),
            (target / F.col("n_tokens_avail")).alias("epochs"),
        )
    )


@register(
    "temperature_mix_weights",
    f"""
    WITH per_src AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM({_NTOK_SQL}) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n_docs, n_tokens,
             CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0, 0)
                  AS BIGINT) AS w_micro
      FROM per_src
    ),
    tot AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS w_sum,
                   CAST(SUM(n_tokens) AS BIGINT) AS tok_sum FROM w),
    shares AS (
      -- HUGEINT (int128) is DuckDB's exact wide-integer twin of Spark's
      -- DECIMAL(38,0) intermediates; decimal // degrades to DOUBLE there
      SELECT source, n_docs, n_tokens, w_micro, tok_sum,
             CAST(CAST(w_micro AS HUGEINT) * 1000000 // w_sum
                  AS BIGINT) AS share_permicro
      FROM w CROSS JOIN tot
    ),
    targets AS (
      SELECT source, n_docs, n_tokens, w_micro, share_permicro,
             CAST(CAST(share_permicro AS HUGEINT) * tok_sum // 1000000
                  AS BIGINT) AS target_tokens
      FROM shares
    )
    SELECT source, n_docs, n_tokens, w_micro, share_permicro, target_tokens,
           CAST(CAST(target_tokens AS HUGEINT) * 1000 // n_tokens
                AS BIGINT) AS epochs_permille
    FROM targets
    """,
    doc="Temperature-based mix reweighting at tau=2: source weight = "
        "sqrt(token count), the standard multilingual-LLM upsampling that "
        "flattens the head/tail imbalance (smaller sources train more "
        "epochs, larger fewer). sqrt is IEEE-754 correctly-rounded — the "
        "one power law both engines compute bit-identically — and every "
        "derived figure (per-source share, target tokens, effective "
        "epochs) is integer micro/permille arithmetic from it, so the "
        "plan is engine-exact end-to-end. The share/target/epoch products "
        "run in DECIMAL(38,0) (floor-divided back to BIGINT results), so "
        "petabyte token counts can't wrap the intermediates. Scale: one "
        "map-side-combined aggregate to #sources rows; the totals ride a "
        "broadcast one-row cross join.",
)
def temperature_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    ntok = F.size(F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0)))
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ntok).cast("bigint").alias("n_tokens"),
    )
    w = per_src.withColumn(
        "w_micro",
        F.round(F.sqrt(F.col("n_tokens").cast("double")) * 1000000.0, 0)
        .cast("long"),
    )
    tot = w.agg(F.sum("w_micro").cast("long").alias("w_sum"),
                F.sum("n_tokens").cast("long").alias("tok_sum"))
    return (
        w.crossJoin(F.broadcast(tot))
        .withColumn(
            "share_permicro",
            F.expr("CAST(CAST(w_micro AS DECIMAL(38,0)) * 1000000 "
                   "DIV w_sum AS BIGINT)"))
        .withColumn(
            "target_tokens",
            F.expr("CAST(CAST(share_permicro AS DECIMAL(38,0)) * tok_sum "
                   "DIV 1000000 AS BIGINT)"))
        .withColumn(
            "epochs_permille",
            F.expr("CAST(CAST(target_tokens AS DECIMAL(38,0)) * 1000 "
                   "DIV n_tokens AS BIGINT)"))
        .select("source", "n_docs", "n_tokens", "w_micro",
                "share_permicro", "target_tokens", "epochs_permille")
    )


# -------------------------------------------------------------- export

# Checked shard sizing: 2 sequences (512 tokens) per shard so every SF
# yields multiple shards per source (the synthetic sources carry ~1.4k
# tokens each at sf0.001/sf0.01). Production uses the same arithmetic
# with thousands of sequences per shard.
SHARD_SEQS = 2
SHARD_TOKENS = SEQ_BUDGET * SHARD_SEQS


@register(
    "export_shard_plan",
    f"""
    WITH tok AS (
      SELECT doc_id, source, {_NTOK_SQL} AS n_tokens FROM documents
      WHERE {_NTOK_SQL} > 0
    ),
    off AS (
      SELECT doc_id, source, n_tokens,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_off
      FROM tok
    ),
    spans AS (
      SELECT doc_id, source, n_tokens, start_off,
             start_off // {SHARD_TOKENS} AS shard_first,
             (start_off + n_tokens - 1) // {SHARD_TOKENS} AS shard_last
      FROM off
    ),
    x AS (
      SELECT source, doc_id, n_tokens, start_off,
             unnest(generate_series(shard_first, shard_last)) AS shard_id
      FROM spans
    )
    SELECT source, shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LEAST(start_off + n_tokens,
                          (shard_id + 1) * {SHARD_TOKENS})
                    - GREATEST(start_off, shard_id * {SHARD_TOKENS}))
                AS BIGINT) AS n_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM x GROUP BY source, shard_id
    """,
    doc=f"The EXPORT step of the training pipeline: the packed per-source "
        f"token stream (pack_token_budget's arithmetic) chunked into "
        f"{SHARD_TOKENS}-token shards ({SHARD_SEQS} x {SEQ_BUDGET}-token "
        "sequences), with each shard's exact token mass (integer overlap "
        "of every doc's token range with the shard range — docs straddle "
        "shard boundaries like they straddle sequences), doc count, and "
        "doc-id span. write_training_shards materializes it. Scale "
        "shape: the per-source window is the packing shuffle already "
        "paid; the shard fan-out explodes each doc to the 1-2 shards it "
        "touches; the aggregate is map-side combined on (source, "
        "shard_id) — shard count is corpus_tokens / SHARD_TOKENS, the "
        "natural write parallelism.",
)
def export_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    spans = _shard_spans(spark, sf_dir)
    x = spans.select(
        "source", "doc_id", "n_tokens", "start_off",
        F.explode(F.sequence("shard_first", "shard_last")).alias("shard_id"),
    )
    ov = (
        F.least(F.col("start_off") + F.col("n_tokens"),
                (F.col("shard_id") + 1) * F.lit(SHARD_TOKENS))
        - F.greatest(F.col("start_off"),
                     F.col("shard_id") * F.lit(SHARD_TOKENS))
    )
    return x.groupBy("source", "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ov).cast("long").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def _shard_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, n_tokens, start_off, shard_first, shard_last) —
    pack_token_budget's offset arithmetic extended with the shard span
    each doc's token range covers. Deliberately EXCLUDES text: the
    running-sum window shuffles on source, and carrying payloads through
    that sort made the 100x probe superlinear (37-72s); on the skinny
    relation the window moves 3 longs + a string key per doc. The writer
    joins text back on doc_id AFTER the arithmetic."""
    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0))).cast("long")
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tok = (
        d.select("doc_id", "source", n_tokens.alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
    )
    off = tok.withColumn(
        "start_off", (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    )
    return (
        off.withColumn("shard_first", F.expr(f"start_off DIV {SHARD_TOKENS}"))
        .withColumn(
            "shard_last", F.expr(f"(start_off + n_tokens - 1) DIV {SHARD_TOKENS}"))
    )


def write_training_shards(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """Materialize the export: every non-empty doc written ONCE, into the
    shard where its token range STARTS (a straddling doc's tail is read
    from the preceding shard at load time, exactly how sequence-packed
    trainers consume shard streams), as parquet partitioned by
    (source, shard_id) — the physical layout export_shard_plan plans.
    Text joins in on doc_id AFTER the offset window (see _shard_spans),
    so payload bytes move through exactly one shuffle: the write
    repartition on the partition key. Deterministic: same corpus ->
    byte-identical shard assignment, so re-runs and resumed export jobs
    converge (overwrite mode)."""
    spans = _shard_spans(spark, sf_dir)
    text = load(spark, sf_dir, "documents").select("doc_id", "text")
    (
        spans.select(
            "doc_id", "n_tokens", "start_off", "source",
            F.col("shard_first").alias("shard_id"),
        )
        .join(text, "doc_id")
        .repartition("source", "shard_id")
        .write.mode("overwrite")
        .partitionBy("source", "shard_id")
        .parquet(out_dir)
    )

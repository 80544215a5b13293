"""Probabilistic sketch operators with ENGINE-EXACT formulations — the
primitives a 100 TB curation pipeline actually runs on: Bloom-filter
membership for cross-corpus decontamination (a broadcast bit set
replaces a shuffle join against billions of eval shingles) and
Count-Min heavy-hitter estimation (bounded-memory frequency for an
unbounded key space).

Unlike engine-native sketches (approx_count_distinct / HLL — see
llm/events.py approx_sketches_demo), these are built from PURE COLUMN
MATH: every hash position derives from md5 (identical in Spark, DuckDB,
and any engine), so both the SKETCH CONTENTS and the resulting
decisions are bit-reproducible and carry hard DuckDB value oracles.
That reproducibility is not academic at scale — a curation decision
("this doc touches the eval set") must be re-derivable months later
from the spec alone, on a different engine if needed.

Representation note: the Bloom filter is materialized as the sparse SET
of hot bit positions (<= M rows, broadcastable) rather than packed
bitmap words — identical semantics, trivial SQL; a deployment packs the
same positions into M/64 int64 words for constant-size broadcast. The
CMS is its literal (depth x width) counter table.

Scale shapes: building either sketch is one map-side-combined aggregate
over the exploded key stream (output bounded by M or D*W, never by the
corpus); probing joins the bounded sketch (broadcast) against the probe
stream — the corpus is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tank_spark.plans.registry import register
from tank_spark.sources.tables import load

_WORD = "[a-z0-9]+"

# Bloom configuration: the filter SELF-SIZES — m = BITS_PER_KEY *
# |distinct eval shingles| (an integer count, identical in both
# engines, so the oracle computes the same m). Proportional sizing is
# the production rule AND the scale property: a FIXED m saturates as
# the keyed set grows (measured: fill -> 1 at 100x made every probe
# positive, degenerating the filter into the exact join it was meant
# to avoid), while proportional m keeps the fill — and the measured
# false-positive rate — constant at any corpus size. 14 bits/key with
# k=7 gives ~0.1% per-shingle FP: low enough that the doc-level flag
# stays selective, high enough that the emitted rows still measure
# real FPs.
BLOOM_BITS_PER_KEY = 14
BLOOM_M_FLOOR = 64  # degenerate-corpus guard (empty eval split)
BLOOM_K = 7         # hash functions
SHINGLE_W = 3       # words per shingle (decontaminate_train_eval parity)

CMS_D = 2         # Count-Min depth (rows)
# Width DELIBERATELY below the corpus vocabulary (31 words): a
# well-provisioned sketch on this tiny vocab would never collide and the
# overestimate column would be vacuously zero. Under-provisioning forces
# real collisions so the emitted rows exercise the estimate-vs-exact gap
# AND the one-sided bound. Production sizes w = ceil(e/epsilon) >> the
# heavy-hitter count; the plan shape is identical at any width.
CMS_W = 16        # Count-Min width (counters per row)
CMS_TOPK = 20     # heavy hitters to verify against exact counts


def _pos_sql(expr: str, mod) -> str:
    """Hash position of a STRING SQL expression: md5 -> first 8 hex ->
    uniform int in [0, mod). ``mod`` may be an int or a SQL scalar
    expression (e.g. the self-sizing Bloom modulus subquery)."""
    return f"('0x' || substr(md5({expr}), 1, 8))::UBIGINT % ({mod})"


def _pos_col(col, mod):
    h8 = F.substring(F.md5(col), 1, 8)
    return F.conv(h8, 16, 10).cast("bigint") % mod


def _split_is_train_sql() -> str:
    from tank_spark.llm.mixing import SPLIT_SALT, SPLIT_TRAIN_PCT

    return (
        f"('0x' || substr(md5('{SPLIT_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8))"
        f"::UBIGINT % 100 < {SPLIT_TRAIN_PCT}"
    )


def _split_is_train_col():
    from tank_spark.llm.mixing import SPLIT_SALT, SPLIT_TRAIN_PCT

    h8 = F.substring(
        F.md5(F.concat(F.lit(SPLIT_SALT), F.col("doc_id").cast("string"))),
        1, 8)
    return (F.conv(h8, 16, 10).cast("bigint") % 100) < SPLIT_TRAIN_PCT


_SHINGLES_CTE = f"""
    w AS (
      SELECT doc_id, regexp_extract_all(lower(text), '{_WORD}') AS ws,
             {_split_is_train_sql()} AS is_train
      FROM documents
    ),
    sh AS (
      SELECT doc_id, is_train,
             ws[j] || ' ' || ws[j + 1] || ' ' || ws[j + 2] AS shingle
      FROM w, UNNEST(generate_series(1, len(ws) - {SHINGLE_W - 1})) AS t(j)
      WHERE len(ws) >= {SHINGLE_W}
    )
"""


_BLOOM_M_SQL = "(SELECT m FROM msize)"

@register(
    "bloom_decontaminate",
    f"""
    WITH {_SHINGLES_CTE},
    seeds(s) AS (SELECT unnest(generate_series(0, {BLOOM_K - 1}))),
    eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE NOT is_train),
    msize AS (
      SELECT GREATEST({BLOOM_M_FLOOR},
                      {BLOOM_BITS_PER_KEY} * COUNT(*))::BIGINT AS m
      FROM eval_sh
    ),
    bloom AS (
      SELECT DISTINCT
             {_pos_sql("'bf' || s.s::VARCHAR || ':' || e.shingle", _BLOOM_M_SQL)} AS pos
      FROM eval_sh e, seeds s
    ),
    train_sh AS (
      SELECT DISTINCT doc_id, shingle FROM sh WHERE is_train
    ),
    probe AS (
      SELECT t.doc_id, t.shingle,
             COUNT(b.pos) = {BLOOM_K} AS might_contain
      FROM train_sh t
      CROSS JOIN seeds s
      LEFT JOIN bloom b
        ON b.pos = {_pos_sql("'bf' || s.s::VARCHAR || ':' || t.shingle", _BLOOM_M_SQL)}
      GROUP BY t.doc_id, t.shingle
    ),
    flags AS (
      SELECT p.doc_id,
             MAX(CASE WHEN p.might_contain THEN 1 ELSE 0 END) AS flag_bloom,
             MAX(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END) AS flag_exact
      FROM probe p
      LEFT JOIN eval_sh e ON p.shingle = e.shingle AND p.might_contain
      GROUP BY p.doc_id
    )
    SELECT doc_id, CAST(flag_bloom AS INTEGER) AS flag_bloom,
           CAST(flag_exact AS INTEGER) AS flag_exact
    FROM flags WHERE flag_bloom = 1
    """,
    doc=f"Bloom-filter decontamination: the held-out split's 3-word "
        f"shingles populate a SELF-SIZING Bloom set "
        f"(m = {BLOOM_BITS_PER_KEY} bits/key, k={BLOOM_K} — constant "
        "fill at any corpus size, see the sizing comment); every train "
        "doc is flagged if ANY shingle fully hits the filter. "
        "flag_exact (true membership) rides along, so the emitted rows "
        "MEASURE the false-positive rate — and validate the sketch's "
        "one-sided guarantee (no false negatives: every exact hit is a "
        "bloom hit). All hash positions are md5-derived: the sketch is "
        "bit-reproducible on any engine (module docstring).",
)
def bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    ws = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_WORD), F.lit(0))
    shingle = F.expr(
        f"transform(sequence(1, size(ws) - {SHINGLE_W - 1}), "
        "j -> concat_ws(' ', slice(ws, j, 3)))"
    )
    sh = (
        d.select("doc_id", ws.alias("ws"), _split_is_train_col().alias("is_train"))
        .filter(F.size("ws") >= SHINGLE_W)
        .select("doc_id", "is_train", F.explode(shingle).alias("shingle"))
    )
    seeds = spark.range(0, BLOOM_K, 1, 1).select(
        F.col("id").cast("int").alias("s"))
    # three consumers (the sizing count, the bloom build, the exact-flag
    # broadcast) each re-ran the eval explode+distinct — materialize it
    # once (eager; ContextCleaner reclaims the blocks)
    eval_sh = (sh.filter(~F.col("is_train")).select("shingle").distinct()
               .localCheckpoint(eager=True))
    # self-sizing modulus: one bounded count job (an exact integer, so
    # the DuckDB twin's scalar subquery lands on the same m)
    m = max(BLOOM_M_FLOOR, BLOOM_BITS_PER_KEY * eval_sh.count())
    pos = _pos_col(
        F.concat(F.lit("bf"), F.col("s").cast("string"), F.lit(":"),
                 F.col("shingle")),
        m,
    )
    bloom = (
        eval_sh.crossJoin(F.broadcast(seeds))
        .select(pos.alias("pos")).distinct()
    )
    train_sh = sh.filter("is_train").select("doc_id", "shingle").distinct()
    probe = (
        train_sh.crossJoin(F.broadcast(seeds))
        .select("doc_id", "shingle", pos.alias("pos"))
        .join(F.broadcast(bloom.withColumn("hit", F.lit(1))), ["pos"], "left")
        .groupBy("doc_id", "shingle")
        .agg((F.count("hit") == BLOOM_K).alias("might_contain"))
    )
    flags = (
        probe.join(
            F.broadcast(eval_sh.withColumn("exact", F.lit(1))),
            (probe["shingle"] == eval_sh["shingle"]) & probe["might_contain"],
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.max(F.col("might_contain").cast("int")).alias("flag_bloom"),
            F.max(F.coalesce(F.col("exact"), F.lit(0))).alias("flag_exact"),
        )
    )
    return flags.filter(F.col("flag_bloom") == 1).select(
        "doc_id", "flag_bloom", "flag_exact"
    )


@register(
    "cms_heavy_hitters",
    f"""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '{_WORD}')) AS word
      FROM documents
    ),
    rows_(r) AS (SELECT unnest(generate_series(0, {CMS_D - 1}))),
    cms AS (
      SELECT r.r,
             {_pos_sql("'cms' || r.r::VARCHAR || ':' || word", CMS_W)} AS pos,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM toks, rows_ r GROUP BY r.r, pos
    ),
    exact AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS exact_n,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word) AS rk
      FROM toks GROUP BY word
    ),
    top AS (SELECT word, exact_n, rk FROM exact WHERE rk <= {CMS_TOPK}),
    est AS (
      SELECT t.word, t.exact_n, t.rk, MIN(cms.c) AS cms_est
      FROM top t
      CROSS JOIN rows_ r
      JOIN cms ON cms.r = r.r
        AND cms.pos = {_pos_sql("'cms' || r.r::VARCHAR || ':' || t.word", CMS_W)}
      GROUP BY t.word, t.exact_n, t.rk
    )
    SELECT word, CAST(rk AS INTEGER) AS rank, exact_n, cms_est,
           cms_est - exact_n AS overestimate
    FROM est
    """,
    doc=f"Count-Min heavy hitters: a d={CMS_D} x w={CMS_W} counter "
        f"sketch built in one aggregate estimates the top-{CMS_TOPK} "
        "words' frequencies; exact counts ride along so the emitted "
        "rows verify the CMS guarantee in-engine (overestimate >= 0, "
        "never under). The sketch table is d*w rows regardless of "
        "corpus or vocabulary size — the bounded-memory frequency "
        "structure streaming/firehose counting uses at 100 TB.",
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(_WORD), F.lit(0))
        ).alias("word")
    )
    rows = spark.range(CMS_D).select(F.col("id").cast("int").alias("r"))
    # per-(row, position) counters — the salt embeds the row index
    pos = _pos_col(
        F.concat(F.lit("cms"), F.col("r").cast("string"), F.lit(":"),
                 F.col("word")),
        CMS_W,
    )
    cms = (
        toks.crossJoin(F.broadcast(rows))
        .select("r", pos.alias("pos"))
        .groupBy("r", "pos")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wnd = Window.orderBy(F.desc("exact_n"), F.asc("word"))
    top = (
        toks.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        .withColumn("rk", F.row_number().over(wnd))
        .filter(F.col("rk") <= CMS_TOPK)
    )
    probe_pos = _pos_col(
        F.concat(F.lit("cms"), F.col("r").cast("string"), F.lit(":"),
                 F.col("word")),
        CMS_W,
    )
    est = (
        F.broadcast(top).crossJoin(F.broadcast(rows))
        .select("word", "exact_n", "rk", "r", probe_pos.alias("pos"))
        .join(cms, ["r", "pos"])
        .groupBy("word", "exact_n", "rk")
        .agg(F.min("c").alias("cms_est"))
    )
    return est.select(
        "word", F.col("rk").cast("int").alias("rank"), "exact_n", "cms_est",
        (F.col("cms_est") - F.col("exact_n")).alias("overestimate"),
    )


# HyperLogLog configuration: 2^HLL_P registers per group. The register
# sum is a sum of 64 exact binary fractions (2^-rho, rho <= 27) whose
# every partial sum fits 33 bits of mantissa — order-INDEPENDENT in IEEE
# doubles, so even the float estimate is engine-exact (verified).
HLL_P = 6
HLL_M = 1 << HLL_P          # 64 registers
_HLL_REST_BITS = 32 - HLL_P  # 26 low bits feed the rho count
# alpha_64 (Flajolet 2007 Fig. 3)
HLL_ALPHA = 0.709

# Small-range (linear counting) correction, applied exactly as the
# paper prescribes when raw <= 2.5m and empty registers remain:
# est = m * ln(m / V). ln() is a transcendental whose last bits differ
# across libm builds — which would break the exact value hash — but V
# takes only 64 possible values, so the corrected estimates are
# PRECOMPUTED HERE and inlined as identical literals in both engines
# (the engine-exactness contract holds: no engine evaluates ln at all).
import math as _math

_HLL_LC = [
    HLL_M * _math.log(HLL_M / v) for v in range(1, HLL_M + 1)
]  # index by V = empty registers (1-based)


@register(
    "hll_cardinality_by_source",
    f"""
    WITH keys AS (
      SELECT DISTINCT source, doc_id FROM documents
    ),
    hashed AS (
      SELECT source,
             ('0x' || substr(md5('hll:' || CAST(doc_id AS VARCHAR)), 1, 8))
               ::UBIGINT AS h32
      FROM keys
    ),
    parts AS (
      SELECT source,
             h32 // {1 << _HLL_REST_BITS} AS bucket,
             h32 % {1 << _HLL_REST_BITS} AS rest
      FROM hashed
    ),
    regs AS (
      SELECT source, bucket,
             MAX(CASE WHEN rest = 0 THEN {_HLL_REST_BITS + 1}
                      ELSE {_HLL_REST_BITS + 1} - length(bin(rest))
                 END) AS rho
      FROM parts GROUP BY source, bucket
    ),
    est AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS regs_used,
             SUM(POWER(2.0, -rho)) + ({HLL_M} - COUNT(*)) AS denom
      FROM regs GROUP BY source
    ),
    exact AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS exact_n FROM keys
      GROUP BY source
    ),
    raw AS (
      SELECT e.source, x.exact_n, e.regs_used,
             {HLL_ALPHA} * {HLL_M} * {HLL_M} / e.denom AS hll_raw_est,
             {HLL_M} - e.regs_used AS v_empty
      FROM est e JOIN exact x ON e.source = x.source
    )
    SELECT source, exact_n, regs_used, hll_raw_est,
           CASE WHEN hll_raw_est <= {2.5 * HLL_M} AND v_empty > 0
                THEN ([{", ".join(repr(c) for c in _HLL_LC)}])[v_empty]
                ELSE hll_raw_est END AS hll_est
    FROM raw
    """,
    doc=f"HyperLogLog cardinality per source ({HLL_M} registers, "
        "Flajolet estimator + linear-counting small-range switch): "
        "bucket and leading-zero rank derive from md5 via exact integer "
        "math (binary-digit count, the llm/lm.py idiom), the register "
        "sum is all exact binary fractions, and the correction's ln "
        "values are precomputed shared literals — so even the FLOAT "
        "estimates hash-match across engines. Exact counts ride along "
        "to measure estimator error in-engine. The register table is "
        "groups x 64 rows regardless of corpus size — the mergeable "
        "bounded-memory cardinality structure (Spark's native "
        "approx_count_distinct is HLL++; this one is spec-reproducible "
        "anywhere).",
)
def hll_cardinality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    keys = d.select("source", "doc_id").distinct()
    h32 = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll:"), F.col("doc_id").cast("string"))),
                    1, 8),
        16, 10,
    ).cast("bigint")
    parts = keys.select(
        "source",
        (h32 / (1 << _HLL_REST_BITS)).cast("bigint").alias("bucket"),
        (h32 % (1 << _HLL_REST_BITS)).alias("rest"),
    )
    rho = F.when(F.col("rest") == 0, F.lit(_HLL_REST_BITS + 1)).otherwise(
        F.lit(_HLL_REST_BITS + 1)
        - F.length(F.conv(F.col("rest").cast("string"), 10, 2))
    )
    regs = parts.groupBy("source", "bucket").agg(F.max(rho).alias("rho"))
    est = regs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("regs_used"),
        (F.sum(F.pow(F.lit(2.0), -F.col("rho")))
         + (HLL_M - F.count(F.lit(1)))).alias("denom"),
    )
    exact = keys.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
    raw = (
        est.join(exact, "source")
        .select(
            "source", "exact_n", "regs_used",
            (F.lit(HLL_ALPHA) * HLL_M * HLL_M / F.col("denom")).alias("hll_raw_est"),
            (HLL_M - F.col("regs_used")).alias("v_empty"),
        )
    )
    lc = F.element_at(
        F.array(*[F.lit(c) for c in _HLL_LC]), F.col("v_empty").cast("int")
    )
    return raw.select(
        "source", "exact_n", "regs_used", "hll_raw_est",
        F.when(
            (F.col("hll_raw_est") <= 2.5 * HLL_M) & (F.col("v_empty") > 0), lc
        ).otherwise(F.col("hll_raw_est")).alias("hll_est"),
    )

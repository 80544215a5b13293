"""BPE tokenizer induction over the ``documents`` table: learn the
byte-pair-encoding merge sequence in-engine (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — the
public algorithm every modern LLM tokenizer family derives from).

Spark shape: BPE trains on the WORD VOCABULARY with frequencies, not the
raw corpus — one vocabulary aggregate bounds every later step to
|vocab| rows regardless of corpus size (the standard trick: at 100 TB
the vocab table is still ~millions of rows and each merge round is a
small pair-count aggregate over it). Each round is:

1. adjacent-pair explode over the per-word token arrays, weighted by
   word count -> map-side-combined SUM per pair (shuffle bounded by the
   live pair-type count, not corpus size);
2. driver pulls the single best pair (count DESC, pair ASC tie-break —
   deterministic across engines and runs);
3. the merge applies as a pure array fold (F.aggregate) — greedy
   left-to-right pairing, exactly the reference semantics — and the
   vocabulary is localCheckpoint'ed so round N+1 doesn't re-analyze
   rounds 1..N (the same lineage-truncation lesson as lsh_components).

The driver holds ONE (pair, count) row per round — never the vocab.

Both registered queries carry FULL DuckDB oracles (r9): the fixed
N_MERGES loop unrolls into chained materialized CTEs — pair argmax per
round plus a positional (gaps-and-islands parity) replay of the greedy
merge — see the twin-SQL section below. tests/test_bpe.py's
from-scratch Python BPE remains the third, value-level check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tank_spark.plans.registry import register
from tank_spark.sources.tables import load

N_MERGES = 8          # checked configuration (production: 30k-100k)
END_OF_WORD = "_"     # end-of-word marker appended to each word


def word_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, cnt): the frequency-weighted training vocabulary."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    )


def _adjacent_pairs(tokens_col):
    """array<string> tokens -> array<struct<left,right>> adjacent pairs."""
    return F.expr(
        "CASE WHEN size({t}) >= 2 THEN transform(sequence(1, size({t}) - 1), "
        "j -> struct(element_at({t}, j) AS left, element_at({t}, j + 1) AS right)) "
        "ELSE array() END".format(t=tokens_col)
    )


def _apply_merge(tokens_col, left: str, right: str):
    """Greedy left-to-right merge of (left, right) -> left||right inside a
    token array, as a pure fold: if the accumulator's last token is
    `left` AND it was not itself just produced by this merge step's
    pairing (greedy non-overlapping), and the incoming token is `right`,
    replace the tail. The sentinel flag rides in the accumulator's last
    element via a struct-free trick: we fold into an array where a
    just-merged tail cannot re-pair because its text is `left||right`,
    which only matches when left == left||right (impossible for
    non-empty right)."""
    lq = left.replace("\\", "\\\\").replace("'", "\\'")
    rq = right.replace("\\", "\\\\").replace("'", "\\'")
    return F.expr(
        f"""aggregate(
             {tokens_col},
             CAST(array() AS ARRAY<STRING>),
             (acc, x) -> CASE
               WHEN size(acc) > 0 AND element_at(acc, -1) = '{lq}'
                    AND x = '{rq}'
               THEN concat(slice(acc, 1, size(acc) - 1),
                           array('{lq}{rq}'))
               ELSE concat(acc, array(x))
             END)"""
    )


def train_bpe(spark: SparkSession, sf_dir: str,
              n_merges: int = N_MERGES) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns one row per merge:
    (merge_rank, left, right, merged, pair_count)."""
    vocab = word_vocab(spark, sf_dir)
    chars = F.expr(
        f"concat(split(word, ''), array('{END_OF_WORD}'))"
    )
    vt = vocab.select("word", "cnt", chars.alias("tokens"))
    vt = vt.localCheckpoint(eager=True)

    merges = []
    for rank in range(n_merges):
        pairs = (
            vt.select("cnt", F.explode(_adjacent_pairs("tokens")).alias("p"))
            .groupBy("p.left", "p.right")
            .agg(F.sum("cnt").alias("pair_count"))
        )
        best = pairs.orderBy(
            F.desc("pair_count"), F.asc("left"), F.asc("right")
        ).first()
        if best is None:
            break
        left, right, cnt = best["left"], best["right"], int(best["pair_count"])
        merges.append((rank, left, right, left + right, cnt))
        vt = vt.select(
            "word", "cnt", _apply_merge("tokens", left, right).alias("tokens")
        ).localCheckpoint(eager=True)

    return spark.createDataFrame(
        merges,
        "merge_rank int, left string, right string, merged string, "
        "pair_count long",
    )


def bpe_tokenize(vt: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a learned merge sequence, in order, to a (word, tokens)
    frame — the encode side of the tokenizer."""
    for left, right in merges:
        vt = vt.withColumn("tokens", _apply_merge("tokens", left, right))
    return vt


# ------------------------------------------------------- DuckDB twin SQL
#
# The module docstring's "not SQL-expressible" claim was half-right: the
# greedy training LOOP can't be a data-driven recursive CTE in DuckDB 1.0
# (no aggregates in recursive terms), but N_MERGES is a fixed constant,
# so the loop UNROLLS into N_MERGES chained CTE blocks — each block
# re-counts adjacent pairs, picks the argmax (count DESC, pair ASC — the
# exact train_bpe tie-break), and applies the merge greedily. The greedy
# non-overlapping left-to-right pairing is positional, not a fold (DuckDB
# has no init-value list fold): a candidate position merges iff its rank
# within its ISLAND of consecutive candidate rows is even (gaps-and-
# islands parity) — provably the same pairing as _apply_merge's
# accumulator fold, because overlapping candidates only arise in runs
# (left == right chains) where greedy takes every other one. The merged
# token can never re-pair within a round on either side (left||right ==
# left needs an empty right). This upgrades BOTH bpe ops from rows-only
# to full hash-matched oracles (VERDICT r8 #5).


def _bpe_round_ctes(r: int) -> str:
    """One unrolled BPE training round: e{r-1} (word, cnt, pos, tok)
    -> merge table m{r} (l, r, c) and re-tokenized e{r}."""
    return f"""
l{r} AS MATERIALIZED (
  SELECT word, cnt, pos, tok,
         lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt,
         ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS rn
  FROM e{r - 1}
),
m{r} AS MATERIALIZED (
  SELECT l, r, c FROM (
    SELECT tok AS l, nxt AS r, SUM(cnt) AS c FROM l{r}
    WHERE nxt IS NOT NULL GROUP BY 1, 2
  ) ORDER BY c DESC, l, r LIMIT 1
),
c{r} AS MATERIALIZED (
  SELECT word, cnt, pos, tok, nxt, rn,
         CASE WHEN tok = (SELECT l FROM m{r})
               AND nxt = (SELECT r FROM m{r}) THEN 1 ELSE 0 END AS cand
  FROM l{r}
),
i{r} AS MATERIALIZED (
  SELECT *, CASE WHEN cand = 1 THEN
    rn - ROW_NUMBER() OVER (PARTITION BY word, cand ORDER BY pos) END AS isl
  FROM c{r}
),
g{r} AS MATERIALIZED (
  SELECT *, CASE WHEN cand = 1 AND
    (rn - MIN(rn) OVER (PARTITION BY word, isl)) % 2 = 0
    THEN 1 ELSE 0 END AS ms
  FROM i{r}
),
e{r} AS MATERIALIZED (
  SELECT word, cnt, pos,
         CASE WHEN ms = 1 THEN tok || nxt ELSE tok END AS tok
  FROM (SELECT *, LAG(ms) OVER (PARTITION BY word ORDER BY pos) AS consumed
        FROM g{r})
  WHERE coalesce(consumed, 0) = 0
)"""


_BPE_HEAD = f"""WITH v AS MATERIALIZED (
  SELECT word, COUNT(*) AS cnt FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
    FROM documents
  ) GROUP BY word
),
e0 AS MATERIALIZED (
  SELECT word, cnt, generate_subscripts(toks, 1) AS pos, unnest(toks) AS tok
  FROM (SELECT word, cnt,
               list_append(string_split(word, ''), '{END_OF_WORD}') AS toks
        FROM v)
),""" + ",".join(_bpe_round_ctes(r) for r in range(1, N_MERGES + 1))

_BPE_TOKENIZE_ORACLE = _BPE_HEAD + f"""
, vt AS (SELECT word, COUNT(*) AS n_sub FROM e{N_MERGES} GROUP BY word),
dw AS (
  SELECT doc_id, word, COUNT(*) AS k FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
    FROM documents
  ) GROUP BY doc_id, word
)
SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_words,
       CAST(SUM(k * n_sub) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(k * n_sub) AS DOUBLE) / SUM(k) AS subwords_per_word
FROM dw JOIN vt USING (word) GROUP BY doc_id
"""

_BPE_MERGES_ORACLE = _BPE_HEAD + "\n" + "\nUNION ALL\n".join(
    f"SELECT CAST({r - 1} AS INTEGER) AS merge_rank, l AS left, r AS right, "
    f"l || r AS merged, CAST(c AS BIGINT) AS pair_count FROM m{r}"
    for r in range(1, N_MERGES + 1)
)


@register(
    "bpe_tokenize_corpus",
    _BPE_TOKENIZE_ORACLE,
    doc="Tokenizer APPLY at corpus scale: the learned merges tokenize "
        "the |vocab|-bounded word-type table ONCE (never per document "
        "occurrence — the standard tokenizer-at-scale trick), and "
        "per-document subword counts come from joining the doc word "
        "stream back on the word type. Emits the real token counts the "
        "packing/budget ops consume (pack_token_budget's whitespace "
        "count is the cheap stand-in; this is the faithful one).",
)
def bpe_tokenize_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges_df = train_bpe(spark, sf_dir)
    merges = [
        (r["left"], r["right"])
        for r in merges_df.orderBy("merge_rank").collect()
    ]
    chars = F.expr(f"concat(split(word, ''), array('{END_OF_WORD}'))")
    vt = word_vocab(spark, sf_dir).select("word", chars.alias("tokens"))
    vt = bpe_tokenize(vt, merges).select(
        "word", F.size("tokens").cast("long").alias("n_sub")
    )
    d = load(spark, sf_dir, "documents")
    doc_words = (
        d.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
            ).alias("word"),
        )
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    # vocab-sized tokenized-type table joins the per-doc word aggregate;
    # AQE picks broadcast when the vocab fits (rare_word_fraction posture)
    return (
        doc_words.join(vt, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("long").alias("n_words"),
            F.sum(F.col("k") * F.col("n_sub")).cast("long").alias("n_bpe_tokens"),
            (F.sum(F.col("k") * F.col("n_sub")).cast("double") / F.sum("k"))
            .alias("subwords_per_word"),
        )
    )


@register(
    "bpe_train_merges",
    _BPE_MERGES_ORACLE,
    doc=f"BPE tokenizer induction (Sennrich 2016): learn the top "
        f"{N_MERGES} merges from the frequency-weighted word vocabulary. "
        "Each round = one map-side-combined pair-count aggregate over "
        "the |vocab|-bounded table + a driver-side single-row argmax + "
        "a pure array-fold merge application (localCheckpoint'ed). "
        "Deterministic tie-break (count DESC, pair ASC).",
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return train_bpe(spark, sf_dir)

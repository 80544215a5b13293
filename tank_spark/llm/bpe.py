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

Iterative + order-sensitive greedy application = not SQL-expressible,
so the registered query is rows-only for the driver; the value-level
oracle is tests/test_bpe.py's from-scratch Python BPE (identical merge
sequence, counts, and final tokenizations), the ivf_train_kmeans
pattern.
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


@register(
    "bpe_tokenize_corpus",
    None,  # depends on the trained merge sequence -> rows-only; value
           # oracle: tests/test_bpe.py reference tokenizer twin
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
    None,  # iterative greedy training is not SQL-expressible -> rows-only;
           # value-level oracle: tests/test_bpe.py's from-scratch Python BPE
    doc=f"BPE tokenizer induction (Sennrich 2016): learn the top "
        f"{N_MERGES} merges from the frequency-weighted word vocabulary. "
        "Each round = one map-side-combined pair-count aggregate over "
        "the |vocab|-bounded table + a driver-side single-row argmax + "
        "a pure array-fold merge application (localCheckpoint'ed). "
        "Deterministic tie-break (count DESC, pair ASC).",
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return train_bpe(spark, sf_dir)

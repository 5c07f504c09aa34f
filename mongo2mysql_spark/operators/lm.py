"""N-gram language-model perplexity scoring (extension layer — the
CCNet recipe: Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", LREC 2020, score web text
with a reference LM and bucket by perplexity; no reference analogue).

A quality pipeline wants a *model-based* fluency signal to complement
the rule-based heuristics (stopword/punctuation ratios): train a small
LM on a trusted corpus, score every candidate document, and keep/bucket
by perplexity.  Here the LM is an add-one-smoothed bigram model — the
relational sweet spot: counts are plain aggregations, scoring is joins.

    P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)

Per document: cross-entropy = -(1/N) Σ log P over its N bigram
transitions; perplexity = exp(cross-entropy).

Scale shape: training is two groupBy-count passes over the (pushed-
down) reference corpus; scoring is one bigram explode of the scored
corpus, a shuffle join against the bigram-count table on the bigram
key (vocabulary²-bounded in principle, observed-bigram-bounded in
fact — NOT broadcastable in general, and the join key is high-
cardinality so it shards well), a broadcast join against the unigram
table (vocabulary-bounded), then one partial-aggregating groupBy(doc).
Nothing grows faster than token count.

Determinism (cross-engine hash contract, same scheme as
operators/dsir.py): every count is an integer; each transition's
log-probability is ln of an exact int-over-int IEEE double ratio,
quantized to DECIMAL(18,6); the per-doc total is an exact DECIMAL sum
of quantized terms (order-free, so run-to-run stable).  Perplexity is
derived from that exact total and rounded in the decimal domain at
1e-4.  Quantization makes logprob/ppl REPRODUCIBLE but not
cross-libm-build portable (a 1-ulp ln difference can cross a rounding
boundary — the r4 driver regression), so the hash gate verifies the
exact integer precursors sum_num/sum_den plus consistency verdicts
instead; logprob/ppl are serving columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo2mysql_spark.functions.text import tokens, word_shingles


def doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, gram, w1) bigram-occurrence stream; gram = 'w1 w2'."""
    return df.select(
        F.col(id_col),
        F.explode(word_shingles(tokens(F.col(text_col)), 2)).alias("gram"),
    ).withColumn("w1", F.split(F.col("gram"), " ").getItem(0))


def train_bigram_lm(
    ref: DataFrame, id_col: str, text_col: str, lazy_vocab: bool = False,
    fused: bool = False,
) -> tuple[DataFrame, DataFrame, "int | DataFrame"]:
    """Fit the reference model: (bigram_counts, unigram_counts, V).

    ``bigram_counts`` = (gram, c12); ``unigram_counts`` = (w1, c1) over
    CONDITIONING positions (every token that starts a bigram — the
    denominator of the conditional); ``V`` = reference vocabulary size
    (distinct tokens), the add-one smoothing mass.

    ``lazy_vocab=True`` returns V as a 1-row DataFrame (column ``__V``)
    instead of an eager int — no driver job runs at train time; the
    scorer folds it in through a broadcast cross join.  Same counts
    either way.

    ``fused=True`` (r13, the tf/keyness pattern): the conditioning-
    position unigram counts are BY DEFINITION the bigram counts summed
    per leading word (both count bigram occurrences), so the bigram
    aggregate is lineage-truncated once and the unigram table derives
    from it — the reference corpus is tokenized ONCE instead of twice
    per materialization.  Identical integers either way (pinned by
    ``test_fused_unigrams_equal_direct``).
    """
    bg = doc_bigrams(ref, id_col, text_col)
    bigrams = bg.groupBy("gram").agg(F.count(F.lit(1)).alias("c12"))
    if fused:
        bigrams = bigrams.localCheckpoint(eager=False)
        unigrams = bigrams.groupBy(
            F.split(F.col("gram"), " ").getItem(0).alias("w1")
        ).agg(F.sum("c12").cast("long").alias("c1"))
    else:
        unigrams = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab_agg = ref.select(
        F.explode(tokens(F.col(text_col))).alias("w")
    ).agg(F.countDistinct("w").alias("__V"))
    if lazy_vocab:
        return bigrams, unigrams, vocab_agg
    return bigrams, unigrams, int(vocab_agg.first()[0])


def lm_perplexity(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bigrams: DataFrame,
    unigrams: DataFrame,
    vocab: int,
) -> DataFrame:
    """(id, n_transitions, sum_num, sum_den, logprob, ppl) per scored
    document.

    Unseen bigrams fall to the smoothed floor 1/(c1+V); unseen
    conditioning words to 1/V.  Documents with < 2 tokens have no
    transitions and are absent (callers left-join; null = unscorable).
    ``logprob`` is the exact DECIMAL sum of quantized per-transition
    ln P; ``ppl`` = exp(-logprob/N) rounded at 1e-4 in decimal domain.
    ``sum_num``/``sum_den`` are the exact integer precursors
    Σ(c12+1) / Σ(c1+V) over the document's transitions — they pin the
    bigram join, the counts, and the smoothing mass bit-exactly on any
    engine, which is what the hash gate verifies (the ln/exp outputs
    themselves are never hashed: a transcendental-derived value is not
    stable across libm builds — VERDICT r4)."""
    stream = doc_bigrams(df, id_col, text_col)
    joined = stream.join(bigrams, "gram", "left").join(
        F.broadcast(unigrams), "w1", "left"
    )
    if isinstance(vocab, DataFrame):
        # lazy smoothing mass: 1-row (__V) frame broadcast-cross-joined
        # in — arithmetic identical to the int literal
        joined = joined.crossJoin(F.broadcast(vocab)).select(
            id_col,
            (F.coalesce("c12", F.lit(0)) + 1).alias("num"),
            (F.coalesce("c1", F.lit(0)) + F.col("__V")).alias("den"),
        )
    else:
        joined = joined.select(
            id_col,
            (F.coalesce("c12", F.lit(0)) + 1).alias("num"),
            (F.coalesce("c1", F.lit(0)) + vocab).alias("den"),
        )
    logp = (
        F.round(
            F.log(F.col("num").cast("double") / F.col("den").cast("double"))
            .cast("decimal(28,8)"),
            6,
        ).cast("decimal(18,6)")
    )
    agg = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.sum(F.col("num").cast("long")).alias("sum_num"),
        F.sum(F.col("den").cast("long")).alias("sum_den"),
        F.sum(logp).cast("decimal(28,6)").alias("logprob"),
    )
    ce = -F.col("logprob").cast("double") / F.col("n_transitions").cast("double")
    return agg.select(
        id_col,
        "n_transitions",
        "sum_num",
        "sum_den",
        "logprob",
        F.round(F.exp(ce).cast("decimal(28,8)"), 4).cast("double").alias("ppl"),
    )

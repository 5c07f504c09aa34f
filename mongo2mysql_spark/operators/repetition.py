"""Repetition-based quality signals (extension layer) — the Gopher /
MassiveText family of filters: documents dominated by a few repeated
n-grams are boilerplate, templating, or spam, and get dropped before
training.

Two cost tiers:

- ``functions/text.dup_token_fraction`` — duplicate-token fraction as a
  pure array expression (narrow; used inline by the corpus pipeline).
- ``top_ngram_fraction`` here — the fraction of the document covered by
  its single most frequent n-gram.  A per-document mode needs a
  GROUPED count, and doing it as an array expression would be O(len²)
  per document — fine on fixtures, quadratic death on a 10k-token web
  page.  The scale shape is explode → aggregation keyed on
  (doc, gram) → per-doc struct-min argmax; all shuffles are on
  (doc_id, gram), so hot documents spread across reducers and no
  per-doc neighbor list ever materializes in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo2mysql_spark.functions.text import word_shingles


def top_ngram_fraction(
    df: DataFrame, id_col: str, toks_col: str, n: int = 2
) -> DataFrame:
    """Per document: the most frequent n-gram, its count, and the
    fraction of the document's n-gram stream it covers.  Deterministic:
    count ties break on the lexicographically smallest gram (struct-min
    over (−count, gram) — one aggregate, no window).  Documents with
    fewer than ``n`` tokens yield no n-grams and are absent (callers
    left-join and treat a null fraction as 0)."""
    grams = df.select(
        F.col(id_col), F.explode(word_shingles(F.col(toks_col), n)).alias("gram")
    )
    counts = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    best = counts.groupBy(id_col).agg(
        F.min(F.struct((-F.col("c")).alias("neg"), F.col("gram").alias("gram"))).alias("b"),
        F.sum("c").alias("ngram_total"),
    )
    return best.select(
        id_col,
        F.col("b.gram").alias("top_gram"),
        (-F.col("b.neg")).alias("top_gram_count"),
        "ngram_total",
        (
            (-F.col("b.neg")).cast("double") / F.col("ngram_total").cast("double")
        ).alias("top_gram_fraction"),
    )

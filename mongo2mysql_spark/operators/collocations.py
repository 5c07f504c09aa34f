"""Collocation extraction — adjacent-token pairs that co-occur far more
than chance (extension layer — the reference's 556-LoC ETL core,
Porter.php, has no text surface).

The corpus-linguistics MWE/collocation readout ("New York", "machine
learning") that feeds tokenizer-vocabulary and phrase-mining decisions.
PMI and log-likelihood are transcendental (the repo's standing no-ln
rule for hash-gated columns); the Dice coefficient carries the same
association signal in portable arithmetic:

    dice = 2·n_xy / (n_x + n_y)

- bigrams generate per document by one ``transform(sequence(...))``
  over the token array (1-based ``element_at`` on BOTH engines — Spark
  ``arr[i]`` is 0-based, DuckDB's is 1-based, so neither engine's
  bracket indexing appears anywhere);
- n_xy is the bigram occurrence count, n_x/n_y the unigram occurrence
  counts — all map-side-combined hash aggregates, everything bounded
  by vocab after the ``min_pair`` support cut;
- qualification is the exact integer cross-multiplication
  ``2·n_xy·den ≥ num·(n_x+n_y)`` (min_dice = num/den rational — the
  float never participates in selection);
- the served ``dice`` is ONE IEEE division of exact integers.

Plan: one explode → pair count, one explode → unigram count, two
keyed joins of the support-cut pair table against the vocab-bounded
unigram table.  Nothing is corpus×corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dice_collocations(
    df: DataFrame,
    toks_col: Column,
    min_pair: int = 5,
    min_dice_num: int = 1,
    min_dice_den: int = 10,
) -> DataFrame:
    """Qualifying adjacent-token collocations: (w1, w2, n_xy, n_x, n_y,
    dice) with n_xy ≥ min_pair and dice ≥ min_dice_num/min_dice_den."""
    toks = df.select(toks_col.alias("toks"))
    bigrams = (
        toks.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(2, size(toks)), i -> "
                    "struct(element_at(toks, i - 1) AS w1, "
                    "element_at(toks, i) AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    pair_cnt = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
        .filter(F.col("n_xy") >= min_pair)
    )
    uni_cnt = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("n_w"))
    )
    joined = (
        pair_cnt.join(
            uni_cnt.select(F.col("w").alias("w1"), F.col("n_w").alias("n_x")),
            "w1",
        )
        .join(
            uni_cnt.select(F.col("w").alias("w2"), F.col("n_w").alias("n_y")),
            "w2",
        )
        .filter(
            2 * F.col("n_xy") * F.lit(min_dice_den)
            >= F.lit(min_dice_num) * (F.col("n_x") + F.col("n_y"))
        )
    )
    return joined.select(
        "w1",
        "w2",
        "n_xy",
        "n_x",
        "n_y",
        (
            (2 * F.col("n_xy")).cast("double")
            / (F.col("n_x") + F.col("n_y")).cast("double")
        ).alias("dice"),
    )


def dice_collocations_sql(
    source_cte: str,
    toks_expr: str,
    min_pair: int = 5,
    min_dice_num: int = 1,
    min_dice_den: int = 10,
) -> str:
    """DuckDB restatement; a final CTE ``colloc(w1, w2, n_xy, n_x, n_y,
    dice)`` with the identical arithmetic chain.  ``toks_expr`` is a
    DuckDB expression producing the same token list (e.g.
    ``string_split(text, ' ')``)."""
    return f"""ctoks AS MATERIALIZED (
      SELECT {toks_expr} AS toks FROM {source_cte}),
    cbigrams AS (
      SELECT bg['w1'] AS w1, bg['w2'] AS w2
      FROM (SELECT unnest(list_transform(generate_series(2, len(toks)),
                          i -> {{'w1': list_extract(toks, i - 1),
                                 'w2': list_extract(toks, i)}})) AS bg
            FROM ctoks WHERE len(toks) >= 2)),
    cpairs AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_xy
      FROM cbigrams GROUP BY 1, 2 HAVING count(*) >= {min_pair}),
    cuni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n_w
      FROM (SELECT unnest(toks) AS w FROM ctoks) GROUP BY w),
    colloc AS (
      SELECT p.w1, p.w2, p.n_xy, ux.n_w AS n_x, uy.n_w AS n_y,
             CAST(2 * p.n_xy AS DOUBLE)
               / CAST(ux.n_w + uy.n_w AS DOUBLE) AS dice
      FROM cpairs p
      JOIN cuni ux ON ux.w = p.w1
      JOIN cuni uy ON uy.w = p.w2
      WHERE 2 * p.n_xy * {min_dice_den}
            >= {min_dice_num} * (ux.n_w + uy.n_w))"""

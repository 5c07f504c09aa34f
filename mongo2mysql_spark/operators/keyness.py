"""Distinctive-term extraction per label (keyness analysis — the
corpus-linguistics measure behind "what words characterize this
domain/language/source"; extension layer — the reference's 556-LoC ETL
core has no text surface).

Classic keyness scores (log-likelihood G², chi-square) are
transcendental-heavy, which would break the cross-engine hash contract
(libm drifts across builds — the repo's standing no-ln/exp rule).  The
RATIO form keeps the full signal in portable arithmetic: a term's
in-label token rate over its rest-of-corpus rate,

    keyness = (n / tot_label) / ((n_rest + 1) / tot_rest)

with +1 smoothing so label-exclusive terms stay finite.  Selection and
ordering never touch the float:

- a term qualifies when it is at least ``min_ratio``× over-represented,
  tested as the exact integer cross-multiplication
  ``n·tot_rest ≥ min_ratio·(n_rest+1)·tot_label``;
- the per-label top-k picks the most FREQUENT qualifying terms with the
  integer total order (n DESC, token) — so engines cannot fork on a
  float tie, and the reported keyness is one IEEE division of exact
  integers (hashable bit-for-bit).

Scale shape: one token explode → (label, token) map-side-combined
count; label and corpus totals are label- and vocab-bounded partial
aggregates broadcast back; the top-k rides salted_topk_per_group, so a
corpus with 3 labels never funnels its whole vocabulary through 3
reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mongo2mysql_spark.operators.skew import salted_topk_per_group


def keyness_terms(
    df: DataFrame,
    label_col: str,
    toks_col: Column,
    min_count: int = 5,
    min_ratio: int = 3,
    k: int = 10,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` distinctive terms per label: terms with ≥ ``min_count``
    in-label occurrences whose in-label rate is ≥ ``min_ratio``× their
    smoothed rest-of-corpus rate, ranked by (n DESC, token).

    ``counts`` lets a caller that already holds the (label, token, n)
    occurrence aggregate (built exactly as the explode+groupBy below
    would) pass it in, so one tokenize pass over the corpus can feed
    both this and a plain term-frequency readout.

    Output: (label, token, n, n_rest, keyness, rank)."""
    if counts is not None:
        cnt = counts
    else:
        toks = df.select(
            F.col(label_col).alias("label"),
            F.explode(toks_col).alias("token"),
        )
        cnt = toks.groupBy("label", "token").agg(F.count(F.lit(1)).alias("n"))
    ltot = cnt.groupBy("label").agg(F.sum("n").alias("tot_l"))
    ttot = cnt.groupBy("token").agg(F.sum("n").alias("n_all"))
    gtot = cnt.groupBy().agg(F.sum("n").alias("tot_all"))
    scored = (
        cnt.join(ttot, "token")
        .join(ltot, "label")
        .crossJoin(F.broadcast(gtot))
        .select(
            "label",
            "token",
            "n",
            (F.col("n_all") - F.col("n")).alias("n_rest"),
            "tot_l",
            (F.col("tot_all") - F.col("tot_l")).alias("tot_rest"),
        )
        .filter(F.col("n") >= min_count)
        # integer cross-multiplied over-representation test — the float
        # never participates in selection or ordering
        .filter(
            F.col("n") * F.col("tot_rest")
            >= F.lit(min_ratio) * (F.col("n_rest") + 1) * F.col("tot_l")
        )
    )
    top = salted_topk_per_group(
        scored, ["label"], [F.desc("n"), F.col("token")], k
    )
    keyness = (
        F.col("n").cast("double") / F.col("tot_l").cast("double")
    ) / (
        (F.col("n_rest") + 1).cast("double") / F.col("tot_rest").cast("double")
    )
    return top.select(
        "label",
        "token",
        "n",
        "n_rest",
        keyness.alias("keyness"),
        F.col("rank").cast("int").alias("rank"),
    )


def keyness_sql(
    docs_cte: str,
    label_col: str,
    toks_expr: str,
    min_count: int = 5,
    min_ratio: int = 3,
    k: int = 10,
) -> str:
    """DuckDB restatement; final CTE ``keytop(label, token, n, n_rest,
    keyness, rank)``.  Two chained IEEE divisions in the same order as
    the Spark expression, integer selection/ordering."""
    return f"""keytoks AS (
      SELECT {label_col} AS label, unnest({toks_expr}) AS token
      FROM {docs_cte}),
    keycnt AS MATERIALIZED (
      SELECT label, token, count(*) AS n FROM keytoks GROUP BY 1, 2),
    keyltot AS (SELECT label, CAST(sum(n) AS BIGINT) AS tot_l
                FROM keycnt GROUP BY label),
    keyttot AS (SELECT token, CAST(sum(n) AS BIGINT) AS n_all
                FROM keycnt GROUP BY token),
    keygtot AS (SELECT CAST(sum(n) AS BIGINT) AS tot_all FROM keycnt),
    keyscored AS (
      SELECT c.label, c.token, c.n,
             t.n_all - c.n AS n_rest,
             l.tot_l,
             g.tot_all - l.tot_l AS tot_rest
      FROM keycnt c
      JOIN keyttot t USING (token)
      JOIN keyltot l USING (label)
      CROSS JOIN keygtot g
      WHERE c.n >= {min_count}
        AND c.n * (g.tot_all - l.tot_l)
            >= {min_ratio} * (t.n_all - c.n + 1) * l.tot_l),
    keytop AS (
      SELECT label, token, CAST(n AS BIGINT) AS n,
             CAST(n_rest AS BIGINT) AS n_rest,
             (CAST(n AS DOUBLE) / CAST(tot_l AS DOUBLE))
               / (CAST(n_rest + 1 AS DOUBLE) / CAST(tot_rest AS DOUBLE))
               AS keyness,
             CAST(rnk AS INTEGER) AS rank
      FROM (SELECT *, row_number() OVER (PARTITION BY label
                                         ORDER BY n DESC, token) AS rnk
            FROM keyscored)
      WHERE rnk <= {k})"""

"""Distribution-drift report between two dataset versions (extension
layer; pairs with ``operators/diffing`` — diff says WHICH rows changed,
drift says whether the DATA as a whole moved).

Before swapping training corpus v(N+1) in for v(N), a pipeline checks
that the distributions it was tuned on haven't shifted: document
lengths, quality scores, per-language mixes.  The standard scalar is
the Population Stability Index over a fixed bucketing:

    PSI = Σ_b (p_new(b) - p_old(b)) · ln(p_new(b) / p_old(b))

with the conventional reading: < 0.1 stable, 0.1-0.25 moderate shift,
> 0.25 action needed.

Bucketing contract: bucket edges come from the OLD (baseline) side's
quantiles — both sides are histogrammed against the same fixed edges,
so the comparison is apples-to-apples and the new side needs no
quantile pass.  Plan shape per column: one ``approxQuantile`` on the
baseline (driver gets ~n_buckets doubles), then ONE aggregation pass
per side computing every column's bucket counts together (the same
fused-aggregate trick as ``operators/profile``) — two scans total
regardless of column count, no join, no shuffle beyond the aggregate.
Empty buckets are Laplace-smoothed so the log is defined.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_edges(df: DataFrame, col: str, n_buckets: int,
                  relative_error: float = 0.001) -> list[float]:
    qs = [i / n_buckets for i in range(1, n_buckets)]
    edges = df.approxQuantile(col, qs, relative_error)
    # dedupe (heavy point masses can repeat an edge) while keeping order
    out: list[float] = []
    for e in edges:
        if not out or e > out[-1]:
            out.append(e)
    return out


def _bucket_expr(col: str, edges: list[float]):
    b = F.lit(0)
    for i, e in enumerate(edges):
        b = F.when(F.col(col) > F.lit(e), F.lit(i + 1)).otherwise(b)
    # NULLs get their own bucket (-1): a null-rate change is drift too
    return F.when(F.col(col).isNull(), F.lit(-1)).otherwise(b)


def _bucket_counts(df: DataFrame, cols_edges: dict[str, list[float]]) -> dict[str, dict[int, int]]:
    """One fused aggregation pass: per column, a map bucket->count."""
    staged = df.select(
        *[_bucket_expr(c, e).alias(f"__b_{c}") for c, e in cols_edges.items()]
    )
    # single groupBy per column would be N shuffles; instead count each
    # column's buckets in one pass via posexplode of (col, bucket) pairs
    melted = staged.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("col"), F.col(f"__b_{c}").alias("bucket"))
                    for c in cols_edges
                ]
            )
        ).alias("e")
    ).select("e.col", "e.bucket")
    rows = melted.groupBy("col", "bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    out: dict[str, dict[int, int]] = {c: {} for c in cols_edges}
    for r in rows:
        out[r["col"]][r["bucket"]] = r["n"]
    return out


_PSI_SCHEMA = (
    "column string, psi double, n_buckets int, verdict string, "
    "n_old long, n_new long, hist_dot long"
)


def _psi_row(c: str, co: dict, cn: dict, smoothing: float) -> tuple:
    """One report row from two bucket-count maps.

    Alongside the float psi and its banded verdict, emits the exact
    integer histogram invariants (row totals and the old·new bucket
    dot product) — these pin the bucketization bit-exactly on any
    engine, which is what the hash gate verifies; the ln-derived psi
    itself is only hash-checked through the verdict band (thresholds
    0.1/0.25 sit far above any libm's 1-ulp wiggle).
    """
    buckets = sorted(set(co) | set(cn))
    n_old, n_new = sum(co.values()), sum(cn.values())
    n_o = n_old + smoothing * len(buckets)
    n_n = n_new + smoothing * len(buckets)
    psi = 0.0
    hist_dot = 0
    for b in buckets:
        po = (co.get(b, 0) + smoothing) / n_o
        pn = (cn.get(b, 0) + smoothing) / n_n
        psi += (pn - po) * math.log(pn / po)
        hist_dot += co.get(b, 0) * cn.get(b, 0)
    verdict = "stable" if psi < 0.1 else ("moderate" if psi <= 0.25 else "shifted")
    return (c, float(psi), len(buckets), verdict, n_old, n_new, hist_dot)


def psi_report(
    old: DataFrame,
    new: DataFrame,
    cols: list[str],
    n_buckets: int = 10,
    smoothing: float = 0.5,
    edges: dict[str, list[float]] | None = None,
) -> DataFrame:
    """One row per column: ``(column, psi, n_buckets, verdict, n_old,
    n_new, hist_dot)`` — see :func:`_psi_row`.

    Edges default to the baseline's quantiles; pass ``edges`` (column →
    ascending bucket boundaries) to pin them — the production-monitor
    shape, where the reference profile fixes the buckets once and every
    later comparison reuses them (also what makes the PSI arithmetic
    restatable by an external oracle).  Both sides' bucket counts come
    from one fused pass each.  ``smoothing`` is the Laplace add-count
    per bucket (keeps ln defined when a bucket empties on one side).
    """
    if edges is None:
        edges = {c: _bucket_edges(old, c, n_buckets) for c in cols}
    counts_old = _bucket_counts(old, edges)
    counts_new = _bucket_counts(new, edges)

    rows = []
    for c in cols:
        rows.append(_psi_row(c, counts_old[c], counts_new[c], smoothing))
    spark = old.sparkSession
    return spark.createDataFrame(rows, _PSI_SCHEMA)


def psi_report_categorical(
    old: DataFrame,
    new: DataFrame,
    cols: list[str],
    top_k: int = 20,
    smoothing: float = 0.5,
) -> DataFrame:
    """PSI over categorical columns (language mix, source mix, license
    tags): buckets are the BASELINE's ``top_k`` most frequent values —
    everything else (and anything newly appearing) folds into
    ``__other__``, NULL stays its own bucket — so the bucketing is
    fixed by the baseline exactly like the numeric path's quantile
    edges.  One groupBy per side per column at category cardinality;
    same smoothing and verdict bands as ``psi_report``.
    """
    rows = []
    for c in cols:
        top = [
            r[0]
            for r in old.filter(F.col(c).isNotNull())
            .groupBy(c).count()
            .orderBy(F.col("count").desc(), F.col(c))
            .limit(top_k)
            .collect()
        ]
        bucket = (
            F.when(F.col(c).isNull(), F.lit("__null__"))
            .when(F.col(c).isin(top), F.col(c).cast("string"))
            .otherwise(F.lit("__other__"))
        )

        def counts(df):
            return {
                r["b"]: r["n"]
                for r in df.select(bucket.alias("b"))
                .groupBy("b").agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }

        rows.append(_psi_row(c, counts(old), counts(new), smoothing))
    return old.sparkSession.createDataFrame(rows, _PSI_SCHEMA)


def cusum_changepoints(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    order_col: str,
    id_col: str,
    slack_q: int,
    threshold_q: int,
    scale: int = 6,
) -> DataFrame:
    """Page 1954 one-sided (upper) CUSUM per series — the sequential
    change-point detector that complements PSI above: PSI compares two
    fixed populations, CUSUM watches an ORDERED stream and flags the
    point where the level shifts upward.

    The textbook recurrence s_i = max(0, s_{i-1} + (x_i − target − k))
    looks inherently sequential, but it has the associative prefix
    form

        s_i = p_i − min(0, min_{j≤i} p_j),   p = prefix sum of
                                              (x_q − target_q − slack_q)

    so the whole detector is ONE key-partitioned window carrying a
    running sum and a running min — the rolling-z-score plan shape, no
    driver loop, no UDF.  Everything is exact integer arithmetic in
    1e-``scale`` units: values quantize once (the house double→DECIMAL
    cast), target_q is the per-key floor mean (exact integer division
    of exact integers), and the alarm ``s > threshold_q`` is an
    integer comparison — every column hash-gates with no float
    contract at all.

    Returns one row per input row: (*key_cols, id, value_q, target_q,
    cusum_s, is_alarm), ordered semantics by (order_col, id).
    """
    from pyspark.sql import Window as W

    mult = 10**scale
    vq = (F.col(value_col).cast(f"decimal(18,{scale})") * mult).cast("long")
    base = df.select(
        *key_cols,
        F.col(order_col).alias("__o"),
        F.col(id_col).alias("id"),
        vq.alias("value_q"),
    )
    per_key = base.groupBy(*key_cols).agg(
        F.sum(F.col("value_q").cast("decimal(30,0)")).alias("__tot"),
        F.count(F.lit(1)).alias("__n"),
    )
    # exact integer floor division (decimal / rounds half-up — not a
    # floor; DIV on the decimal pair is the portable floor)
    target = per_key.select(
        *key_cols,
        F.expr("CAST(__tot DIV __n AS BIGINT)").alias("target_q"),
    )
    w = (
        W.partitionBy(*key_cols)
        .orderBy("__o", "id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    d = (
        F.col("value_q").cast("decimal(30,0)")
        - F.col("target_q")
        - F.lit(slack_q)
    )
    scored = base.join(target, key_cols).withColumn(
        "__p", F.sum(d).over(w).cast("decimal(30,0)")
    )
    s = F.col("__p") - F.least(F.lit(0).cast("decimal(30,0)"), F.min("__p").over(w))
    return scored.select(
        *key_cols,
        "id",
        "value_q",
        "target_q",
        s.cast("long").alias("cusum_s"),
        (s > F.lit(threshold_q)).alias("is_alarm"),
    )


def cusum_sql(
    events_cte: str,
    key_col: str,
    value_col: str,
    order_col: str,
    id_col: str,
    slack_q: int,
    threshold_q: int,
    scale: int = 6,
) -> str:
    """DuckDB restatement; a final CTE ``cusum(key, id, value_q,
    target_q, cusum_s, is_alarm)`` with the identical prefix-form
    arithmetic (HUGEINT running sums, ``//`` floor mean)."""
    mult = 10**scale
    return f"""cbase AS (
      SELECT {key_col} AS key, {order_col} AS o, {id_col} AS id,
             CAST(CAST({value_col} AS DECIMAL(18,{scale})) * {mult}
                  AS BIGINT) AS value_q
      FROM {events_cte}),
    ctarget AS (
      SELECT key,
             CAST(CAST(SUM(CAST(value_q AS HUGEINT)) AS HUGEINT)
                  // count(*) AS BIGINT) AS target_q
      FROM cbase GROUP BY key),
    cpre AS (
      SELECT b.key, b.o, b.id, b.value_q, t.target_q,
             SUM(CAST(b.value_q AS HUGEINT) - t.target_q - {slack_q})
               OVER (PARTITION BY b.key ORDER BY b.o, b.id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
      FROM cbase b JOIN ctarget t USING (key)),
    cmin AS (
      SELECT key, id, value_q, target_q, p,
             MIN(p) OVER (PARTITION BY key ORDER BY o, id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS mn
      FROM cpre),
    cusum AS (
      SELECT key, id, value_q, target_q,
             CAST(p - LEAST(CAST(0 AS HUGEINT), mn) AS BIGINT) AS cusum_s,
             p - LEAST(CAST(0 AS HUGEINT), mn) > {threshold_q} AS is_alarm
      FROM cmin)"""

"""Histogram-based equi-join cardinality estimation — the System-R
statistics path, completing the planner triangle next to the exact
join count and the KMV tuple-sketch estimate (operators/kmv.py):
exact (a full join), sketch (mergeable sub-linear state), HISTOGRAM
(precomputed per-table stats, ZERO contact between the tables at
estimation time — the only option when the optimizer must cost a
join before running anything).

Formula (Selinger et al. 1979, the per-bucket refinement every
textbook optimizer ships): align both tables' join-key histograms on
SHARED bucket boundaries and sum ``n_a·n_b / max(d_a, d_b)`` per
bucket — uniformity assumed only WITHIN a bucket, so skew between
buckets is captured by the histogram itself.  For a PK-FK join the
formula is near-exact: the PK side has n_b = d_b per bucket, making
each bucket's term n_a·(n_b/d_b) = n_a.

Engine parity: per-bucket estimates are ``(n_a·n_b·10^6) DIV
max(d_a, d_b)`` — integer floor arithmetic — and the total is an
INTEGER sum of those scaled terms (order-free, unlike a float sum
whose accumulation order differs across engines); the only IEEE op
is the final /1e6 per served value.  Products must fit BIGINT
(n_a·n_b < ~9·10^12 per bucket); at counts beyond that the same
chain runs in DECIMAL(38,0).

Scale shape: one map-side-combined aggregate per table to bucket
cardinality (these ARE the ANALYZE statistics — persisted once,
reused by every estimate), one bucket-keyed full-outer join of two
n_buckets-row frames.  The exact join count emitted alongside is the
VERIFICATION column for the gate — production reads the estimate
precisely to avoid that join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000


def hist_join_estimate(
    a: DataFrame,
    key_a: str,
    b: DataFrame,
    key_b: str,
    n_buckets: int = 16,
    with_exact: bool = True,
) -> DataFrame:
    """Per-bucket rows (bucket, n_a, d_a, n_b, d_b, est) plus one
    total row (bucket = -1) carrying the summed estimate and — when
    ``with_exact`` — the true join count for verification."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    ka = a.filter(F.col(key_a).isNotNull()).select(
        F.col(key_a).cast("long").alias("k")
    )
    kb = b.filter(F.col(key_b).isNotNull()).select(
        F.col(key_b).cast("long").alias("k")
    )
    dom = ka.unionByName(kb).agg(
        F.min("k").alias("lo"), F.max("k").alias("hi")
    ).first()
    lo, hi = dom["lo"], dom["hi"]
    spark = a.sparkSession
    if lo is None:
        out = spark.createDataFrame(
            [(-1, 0, 0, 0, 0, 0.0, 0)],
            "bucket int, n_a long, d_a long, n_b long, d_b long,"
            " est double, exact long",
        )
        return out if with_exact else out.drop("exact")
    span = hi - lo + 1
    # integer floor division on BOTH engines — a double divide + cast
    # could round up across a boundary where DuckDB's // floors;
    # (k-lo)*n fits BIGINT for key domains < 2^63/n_buckets
    bexpr = F.expr(f"CAST((k - {lo}) * {n_buckets} DIV {span} AS INT)")

    def h(side: DataFrame, na: str, da: str) -> DataFrame:
        return (
            side.select("k", bexpr.alias("bucket"))
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).cast("long").alias(na),
                F.count_distinct(F.col("k")).cast("long").alias(da),
            )
        )

    ha = h(ka, "n_a", "d_a")
    hb = h(kb, "n_b", "d_b")
    per = (
        ha.join(hb, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("d_a", F.lit(0)).alias("d_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
            F.coalesce("d_b", F.lit(0)).alias("d_b"),
        )
        .withColumn(
            "__est6",
            F.when(
                F.greatest("d_a", "d_b") > 0,
                F.expr(
                    f"n_a * n_b * {_SCALE}"
                    f" DIV greatest(d_a, d_b)"
                ),
            ).otherwise(F.lit(0)).cast("long"),
        )
    )
    buckets = per.select(
        "bucket", "n_a", "d_a", "n_b", "d_b",
        (F.col("__est6").cast("double") / _SCALE).alias("est"),
        F.lit(None).cast("long").alias("exact"),
    )
    tot = per.agg(
        F.sum("n_a").cast("long").alias("n_a"),
        F.sum("d_a").cast("long").alias("d_a"),
        F.sum("n_b").cast("long").alias("n_b"),
        F.sum("d_b").cast("long").alias("d_b"),
        F.sum("__est6").cast("long").alias("__t6"),
    )
    if with_exact:
        exact = ka.join(kb, "k").count()
        tot = tot.withColumn("exact", F.lit(exact).cast("long"))
    else:
        tot = tot.withColumn("exact", F.lit(None).cast("long"))
    total = tot.select(
        F.lit(-1).alias("bucket"),
        "n_a", "d_a", "n_b", "d_b",
        (F.col("__t6").cast("double") / _SCALE).alias("est"),
        "exact",
    )
    out = buckets.unionByName(total)
    return out if with_exact else out.drop("exact")


def hist_join_estimate_sql(
    table_a: str,
    key_a: str,
    table_b: str,
    key_b: str,
    n_buckets: int = 16,
    prefix: str = "hj",
) -> str:
    """DuckDB restatement; final CTE ``<prefix>out(bucket, n_a, d_a,
    n_b, d_b, est, exact)`` — same shared-boundary integer bucketing,
    same scaled-integer floor terms and order-free integer total."""
    x = prefix
    return f"""{x}ka AS (
      SELECT CAST({key_a} AS BIGINT) AS k FROM {table_a}
      WHERE {key_a} IS NOT NULL),
    {x}kb AS (
      SELECT CAST({key_b} AS BIGINT) AS k FROM {table_b}
      WHERE {key_b} IS NOT NULL),
    {x}dom AS (
      SELECT min(k) AS lo, max(k) - min(k) + 1 AS span
      FROM (SELECT k FROM {x}ka UNION ALL SELECT k FROM {x}kb)),
    {x}ha AS (
      SELECT CAST((k - d.lo) * {n_buckets} // d.span AS INTEGER) AS bucket,
             CAST(count(*) AS BIGINT) AS n_a,
             CAST(count(DISTINCT k) AS BIGINT) AS d_a
      FROM {x}ka CROSS JOIN {x}dom d GROUP BY 1),
    {x}hb AS (
      SELECT CAST((k - d.lo) * {n_buckets} // d.span AS INTEGER) AS bucket,
             CAST(count(*) AS BIGINT) AS n_b,
             CAST(count(DISTINCT k) AS BIGINT) AS d_b
      FROM {x}kb CROSS JOIN {x}dom d GROUP BY 1),
    {x}per AS (
      SELECT bucket,
             COALESCE(n_a, 0) AS n_a, COALESCE(d_a, 0) AS d_a,
             COALESCE(n_b, 0) AS n_b, COALESCE(d_b, 0) AS d_b,
             CASE WHEN GREATEST(COALESCE(d_a, 0), COALESCE(d_b, 0)) > 0
                  THEN (COALESCE(n_a, 0) * COALESCE(n_b, 0) * {_SCALE})
                       // GREATEST(COALESCE(d_a, 0), COALESCE(d_b, 0))
                  ELSE 0 END AS est6
      FROM {x}ha a FULL JOIN {x}hb b USING (bucket)),
    {x}exact AS (
      SELECT CAST(count(*) AS BIGINT) AS ex
      FROM {x}ka a JOIN {x}kb b USING (k)),
    {x}out AS (
      SELECT bucket, n_a, d_a, n_b, d_b,
             CAST(est6 AS DOUBLE) / {_SCALE} AS est,
             CAST(NULL AS BIGINT) AS exact
      FROM {x}per
      UNION ALL
      SELECT -1,
             CAST(SUM(n_a) AS BIGINT), CAST(SUM(d_a) AS BIGINT),
             CAST(SUM(n_b) AS BIGINT), CAST(SUM(d_b) AS BIGINT),
             CAST(SUM(est6) AS DOUBLE) / {_SCALE},
             (SELECT ex FROM {x}exact)
      FROM {x}per)"""

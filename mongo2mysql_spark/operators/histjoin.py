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


def _bucket_union_est(ha: DataFrame, hb: DataFrame) -> DataFrame:
    """The shared per-bucket estimate frame both DataFrame paths build:
    full-outer join of (bucket, n_a, d_a) × (bucket, n_b, d_b),
    zero-coalesced, plus the scaled-integer Selinger term ``__est6`` =
    n_a·n_b·10^6 DIV max(d_a, d_b).  ONE implementation so the
    on-the-fly and stats-served paths cannot drift (their cross-path
    hash gate depends on bit-identical terms)."""
    return (
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


def hist_join_estimate(
    a: DataFrame,
    key_a: str,
    b: DataFrame,
    key_b: str,
    n_buckets: int = 16,
    with_exact: bool = False,
) -> DataFrame:
    """Per-bucket rows (bucket, n_a, d_a, n_b, d_b, est) plus one
    total row (bucket = -1) carrying the summed estimate and — when
    ``with_exact`` — the true join count for verification.

    ``with_exact`` defaults to FALSE: the exact column runs the full
    join the estimator exists to avoid — production costing never
    wants it; the round gate passes ``with_exact=True`` explicitly."""
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
    per = _bucket_union_est(ha, hb)
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


def analyze_key_stats(
    df: DataFrame,
    key_col: str,
    n_buckets: int = 16,
    lo: int = 0,
    hi: int = 2**31 - 1,
) -> DataFrame:
    """The persisted ANALYZE artifact for one table's join key: the
    per-bucket (n, d) statistics :func:`hist_join_estimate` derives on
    the fly, computed ONCE over a FIXED caller-declared key domain
    ``[lo, hi]`` so that independently-analyzed tables bucket on
    shared boundaries (data-derived domains would misalign).  Keys
    outside the declared domain clamp into the edge buckets (the
    open-ended first/last ranges of the read planner's contract —
    rows are never dropped from the statistics).

    One map-side-combined aggregate per call; output is <= n_buckets
    rows plus the domain metadata repeated per row — write it with
    ``df.write.parquet(path)`` next to the table and serve every
    subsequent estimate from the stored stats with ZERO table contact
    (:func:`hist_join_estimate_from_stats`).

    Returns (bucket, n, d, lo, hi, n_buckets).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if hi < lo:
        raise ValueError(f"hi < lo: [{lo}, {hi}]")
    span = hi - lo + 1
    k = F.col(key_col).cast("long")
    # Clamp the KEY into [lo, hi] BEFORE the multiply, then bucket: a
    # key far outside the declared domain would overflow (k-lo)*
    # n_buckets in BIGINT — Spark wraps silently and the old
    # bucket-level clamp then landed e.g. a huge positive key (wrapped
    # negative) in bucket 0 instead of n_buckets-1, quietly skewing the
    # persisted stats (and ANSI/DuckDB would raise on the same
    # expression).  With the key clamped first the product is bounded
    # by span*n_buckets, and the result is identical for in-domain
    # keys (the clamp is the identity there).  Out-of-domain keys
    # still land in the edge buckets — the open-ended first/last
    # ranges of the read planner's contract.
    bexpr = F.expr(
        f"CAST((GREATEST(CAST({lo} AS BIGINT), LEAST(CAST({hi} AS BIGINT),"
        f" CAST({key_col} AS BIGINT))) - {lo}) * {n_buckets}"
        f" DIV {span} AS INT)"
    )
    return (
        df.filter(k.isNotNull())
        .select(k.alias("__k"), bexpr.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count_distinct(F.col("__k")).cast("long").alias("d"),
        )
        .select(
            "bucket", "n", "d",
            F.lit(lo).cast("long").alias("lo"),
            F.lit(hi).cast("long").alias("hi"),
            F.lit(n_buckets).cast("int").alias("n_buckets"),
        )
    )


def hist_join_estimate_from_stats(
    stats_a: DataFrame, stats_b: DataFrame,
    assume_meta: "tuple[int, int, int] | None" = None,
) -> DataFrame:
    """Serve the join-size estimate purely from two persisted
    :func:`analyze_key_stats` artifacts — what the docstring's System-R
    story promises: the optimizer costs the join from stored
    statistics, touching NEITHER table.  Input frames are <= n_buckets
    rows each; the whole plan is one bucket-keyed full-outer join of
    two tiny frames plus a 1-row metadata cross-check.

    Raises ``ValueError`` when the two artifacts were analyzed with
    different (lo, hi, n_buckets) — misaligned boundaries would make
    the per-bucket formula silently meaningless.  A caller that built
    BOTH artifacts itself with the same declared domain can pass that
    domain as ``assume_meta=(lo, hi, n_buckets)`` to skip the
    validation collects (they eagerly ran both stats aggregates just
    to read metadata); the served rows are identical either way — the
    empty-artifact branches below only ever substitute an EMPTY frame
    of the same schema, which is exactly what an empty side already
    is, so the lazy full-outer path computes the same rows, including
    the zero-filled total when both sides are empty.
    """
    if assume_meta is not None:
        ha = stats_a.select(
            "bucket", F.col("n").alias("n_a"), F.col("d").alias("d_a")
        )
        hb = stats_b.select(
            "bucket", F.col("n").alias("n_b"), F.col("d").alias("d_b")
        )
        per = _bucket_union_est(ha, hb)
        buckets = per.select(
            "bucket", "n_a", "d_a", "n_b", "d_b",
            (F.col("__est6").cast("double") / _SCALE).alias("est"),
        )
        total = per.agg(
            F.sum("n_a").cast("long").alias("n_a"),
            F.sum("d_a").cast("long").alias("d_a"),
            F.sum("n_b").cast("long").alias("n_b"),
            F.sum("d_b").cast("long").alias("d_b"),
            F.sum("__est6").cast("long").alias("__t6"),
        ).select(
            F.lit(-1).alias("bucket"),
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("d_a", F.lit(0)).alias("d_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
            F.coalesce("d_b", F.lit(0)).alias("d_b"),
            F.coalesce(
                F.col("__t6").cast("double") / _SCALE, F.lit(0.0)
            ).alias("est"),
        )
        return buckets.unionByName(total)
    meta_a = stats_a.select("lo", "hi", "n_buckets").distinct().collect()
    meta_b = stats_b.select("lo", "hi", "n_buckets").distinct().collect()
    if len(meta_a) == 0 and len(meta_b) == 0:
        # BOTH artifacts empty (empty or all-NULL-key tables): estimate
        # 0 — the same zero-filled total row hist_join_estimate serves
        # on the empty edge, not an error (no domain to validate)
        spark = stats_a.sparkSession
        return spark.createDataFrame(
            [(-1, 0, 0, 0, 0, 0.0)],
            "bucket int, n_a long, d_a long, n_b long, d_b long, est double",
        )
    if len(meta_a) == 0 or len(meta_b) == 0:
        # exactly ONE empty artifact: the on-the-fly estimator still
        # emits the non-empty side's per-bucket n/d rows (its zero-row
        # edge needs BOTH sides empty), so the stats-served path must
        # too — an empty-SIDE stats frame over the other side's
        # declared domain runs the normal full-outer path below, and
        # the output matches hist_join_estimate(with_exact=False)
        # bucket for bucket (every est is 0, counts survive)
        nonempty, meta = (
            (stats_b, meta_b) if len(meta_a) == 0 else (stats_a, meta_a)
        )
        synth = nonempty.sparkSession.createDataFrame(
            [], "bucket int, n long, d long, lo long, hi long, n_buckets int"
        )
        if len(meta_a) == 0:
            stats_a, meta_a = synth, meta
        else:
            stats_b, meta_b = synth, meta
    if len(meta_a) != 1 or len(meta_b) != 1 or tuple(meta_a[0]) != tuple(meta_b[0]):
        raise ValueError(
            f"stats domains differ or are inconsistent: "
            f"a={[tuple(m) for m in meta_a]} b={[tuple(m) for m in meta_b]}"
        )
    ha = stats_a.select(
        "bucket", F.col("n").alias("n_a"), F.col("d").alias("d_a")
    )
    hb = stats_b.select(
        "bucket", F.col("n").alias("n_b"), F.col("d").alias("d_b")
    )
    per = _bucket_union_est(ha, hb)
    buckets = per.select(
        "bucket", "n_a", "d_a", "n_b", "d_b",
        (F.col("__est6").cast("double") / _SCALE).alias("est"),
    )
    total = per.agg(
        F.sum("n_a").cast("long").alias("n_a"),
        F.sum("d_a").cast("long").alias("d_a"),
        F.sum("n_b").cast("long").alias("n_b"),
        F.sum("d_b").cast("long").alias("d_b"),
        F.sum("__est6").cast("long").alias("__t6"),
    ).select(
        F.lit(-1).alias("bucket"),
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("d_a", F.lit(0)).alias("d_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
        F.coalesce("d_b", F.lit(0)).alias("d_b"),
        F.coalesce(
            F.col("__t6").cast("double") / _SCALE, F.lit(0.0)
        ).alias("est"),
    )
    return buckets.unionByName(total)


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
      -- COALESCE: SUM over the zero-bucket (empty-input) edge is NULL
      -- in SQL while the Spark path special-cases empties to a
      -- zero-filled total row — both engines must emit zeros there
      SELECT -1,
             CAST(COALESCE(SUM(n_a), 0) AS BIGINT),
             CAST(COALESCE(SUM(d_a), 0) AS BIGINT),
             CAST(COALESCE(SUM(n_b), 0) AS BIGINT),
             CAST(COALESCE(SUM(d_b), 0) AS BIGINT),
             CAST(COALESCE(SUM(est6), 0) AS DOUBLE) / {_SCALE},
             (SELECT ex FROM {x}exact)
      FROM {x}per)"""

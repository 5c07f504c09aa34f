"""Rolling-window anomaly scoring over time-series streams (extension
layer; SURVEY.md §2 'Interval/time-series' — no reference analogue, the
reference has no time-series surface at all).

An ingest pipeline watches its own metrics (events/sec, bytes/doc,
error values) for regressions; the standard first tool is a rolling
z-score: how many trailing-window standard deviations is this point
from the trailing-window mean?  Implemented as ONE window pass per
key — ``avg``/``stddev`` over a trailing row frame — entirely in
JVM expressions (no UDF), so the plan is a single shuffle on the key
followed by an in-partition sort: the same shape at 60k rows or 100 TB
(keys partition the work; no global window exists).

The window EXCLUDES the current row (frame ``[-n, -1]``): a genuine
outlier must not inflate its own baseline — with the current row
included, a big spike drags the mean toward itself and shrinks its own
score (self-masking).  The first ``min_points`` rows per key emit NULL
scores rather than unstable small-sample verdicts.

Population stddev (``stddev_pop``) is used: the trailing window IS the
population being described, and it keeps the n=1 window defined
(sample stddev divides by n-1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mongo2mysql_spark.operators.selection import grouped_exact_quantiles


def rolling_zscore(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    window: int = 20,
    min_points: int = 5,
    threshold: float = 3.0,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Adds ``roll_mean``, ``roll_std``, ``zscore``, ``is_anomaly``.

    ``tiebreak_cols`` must make the per-key ordering total (pass the
    event id when timestamps can collide) — determinism contract of the
    whole registry.  ``zscore`` is NULL for the first ``min_points``
    rows of each key and when the trailing window is constant
    (std = 0: no scale to score against — flagged separately via
    ``is_constant_window``).
    """
    order = [F.col(order_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(-window, -1)
    )
    n_prev = F.count(F.col(value_col)).over(w)
    mean = F.avg(F.col(value_col)).over(w)
    std = F.stddev_pop(F.col(value_col)).over(w)
    ready = n_prev >= min_points
    z = F.when(
        ready & (std > 0), (F.col(value_col) - mean) / std
    )
    return (
        df.withColumn("roll_mean", F.when(ready, mean))
        .withColumn("roll_std", F.when(ready, std))
        .withColumn("zscore", z)
        .withColumn("is_constant_window", ready & (std == 0))
        .withColumn(
            "is_anomaly",
            F.when(z.isNotNull(), F.abs(z) > threshold).otherwise(F.lit(False)),
        )
    )


def rolling_frame_stats(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    window: int = 20,
    min_points: int = 5,
    threshold: int = 3,
    tiebreak_cols: list[str] | None = None,
    scale: int = 6,
) -> DataFrame:
    """Exact-arithmetic twin of :func:`rolling_zscore` — same trailing
    frame, same verdict, zero floating point.

    The z-score test ``|v - mean| / std > t`` is equivalent (for
    integer-quantized values) to
    ``(n*v - sum)^2  >  t^2 * (n*sumsq - sum^2)`` — with
    ``mean = sum/n`` and ``std = sqrt(n*sumsq - sum^2)/n`` both sides
    of ``z^2 > t^2`` scale by ``n^2*var``: every quantity is an
    integer, so the
    anomaly verdict is decidable in exact decimal arithmetic with no
    rounding anywhere.  Values are quantized to ``10^-scale`` (a
    deterministic double→DECIMAL cast — engines agree on non-tie
    round-to-nearest, and binary doubles never sit exactly on a decimal
    half).  This is the hash-verifiable form the query registry runs;
    ``rolling_zscore`` (floating mean/std, the human-readable scores)
    must agree with it on every ready, non-constant row — asserted in
    tests.

    Plan shape is identical to rolling_zscore: one shuffle on the key,
    one in-partition sort, O(window) state — no global window.
    ``threshold`` is an integer number of standard deviations (the
    exact form squares it).
    """
    mult = 10**scale
    order = [F.col(order_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order).rowsBetween(-window, -1)
    vq = (F.col(value_col).cast(f"decimal(18,{scale})") * mult).cast("long")
    out = df.withColumn("__vq", vq)
    n_prev = F.count("__vq").over(w)
    s = F.coalesce(F.sum("__vq").over(w), F.lit(0)).cast("long")
    q = F.coalesce(
        F.sum(F.col("__vq").cast("decimal(19,0)") * F.col("__vq").cast("decimal(19,0)")).over(w),
        F.lit(0),
    ).cast("decimal(38,0)")
    out = (
        out.withColumn("n_prev", n_prev)
        .withColumn("frame_sum_q", s)
        .withColumn("frame_sumsq_q", q)
    )
    # All in decimal: n*v with v near 1e18 (|value| ~ 1e12 at scale=6)
    # silently wraps int64, while the DuckDB oracle computes in HUGEINT
    # — decimal keeps both engines on the same arithmetic.  Magnitude
    # envelope: |d| ≤ 2·window·10^scale·max|value| must stay below
    # ~1e19 for d² to fit decimal(38,0) (beyond it both sides overflow
    # NULL rather than silently diverge); pass a smaller ``scale`` for
    # larger value magnitudes.
    d = (
        F.col("n_prev").cast("decimal(5,0)") * F.col("__vq").cast("decimal(19,0)")
        - F.col("frame_sum_q").cast("decimal(24,0)")
    )  # n*v - sum (exact decimal)
    lhs = d * d
    var_n2 = (
        F.col("n_prev").cast("decimal(5,0)") * F.col("frame_sumsq_q")
        - F.col("frame_sum_q").cast("decimal(24,0)") * F.col("frame_sum_q").cast("decimal(24,0)")
    )  # n*sumsq - sum^2 (exact, >= 0)
    ready = F.col("n_prev") >= min_points
    return (
        out.withColumn("is_ready", ready)
        .withColumn("is_constant_window", ready & (var_n2 == 0))
        .withColumn(
            "is_anomaly",
            ready & (var_n2 > 0) & (lhs > var_n2 * F.lit(threshold * threshold)),
        )
        .withColumnRenamed("__vq", "value_q")
    )


def mad_outliers(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    id_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """Median/MAD robust outlier detection per series — the global
    robust complement of the rolling z-score above (mean/std are
    dragged by the very outliers they're meant to flag; the median and
    the median absolute deviation have a 50% breakdown point).

    Both medians come from ``grouped_exact_quantiles`` (bit-identical
    to the engines' interpolated quantiles, no per-group value
    buffer), the deviation is one IEEE subtract + abs of portable
    doubles, and the verdict ``|v − med| > k·mad`` is a float
    comparison of identical operands in both engines — so every
    column hash-gates.  ``is_degenerate`` marks mad = 0 series
    (constant-majority), where the k·mad rule is vacuous — callers
    fall back to ``abs_dev > 0`` there, mirroring the rolling
    z-score's constant-window flag.

    Plan: two grouped-quantile passes + two broadcast-sized key joins
    + one map-only verdict projection.  Returns one row per input row:
    (*id_cols, *key_cols, value, med, mad, abs_dev, is_degenerate,
    is_mad_outlier).
    """
    # LEFT joins: grouped_exact_quantiles drops groups whose values
    # are ALL NULL (it filters non-null before histogramming), but the
    # input rows of such a group must survive with NULL med/mad — the
    # SQL restatement's GROUP BY emits a NULL-median row for them and
    # its joins keep every input row (same class as the r9
    # queries/relational.py:187 inner-join drop)
    med = grouped_exact_quantiles(df, key_cols, value_col, {"med": 0.5})
    dev = df.select(*id_cols, *key_cols, F.col(value_col).alias("value")).join(
        med, key_cols, "left"
    ).withColumn("abs_dev", F.abs(F.col("value") - F.col("med")))
    mad = grouped_exact_quantiles(dev, key_cols, "abs_dev", {"mad": 0.5})
    out = dev.join(mad, key_cols, "left")
    return out.select(
        *id_cols,
        *key_cols,
        "value",
        "med",
        "mad",
        "abs_dev",
        (F.col("mad") == 0.0).alias("is_degenerate"),
        (
            (F.col("mad") > 0.0)
            & (F.col("abs_dev") > F.lit(float(k)) * F.col("mad"))
        ).alias("is_mad_outlier"),
    )

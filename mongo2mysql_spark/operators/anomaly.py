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

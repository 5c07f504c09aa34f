"""Per-key linear trend over hourly event counts — exact OLS in integer
arithmetic (extension layer — the reference's 556-LoC ETL core,
Porter.php, has no time-series surface).

The monitoring/capacity readout next to operators/forecast: is this
series growing, and how fast?  Slope and intercept of ordinary least
squares over the series' hourly counts, where SILENT hours count as
zero observations (a trend fitted only on busy hours biases toward
flat).  The trick that keeps it one aggregate: zero cells contribute
nothing to Σy or Σxy, and over the contiguous hour span lo..hi the
x-sums have closed forms —

    n   = hi − lo + 1                 (span hours)
    Σx  = n(n−1)/2                    (x = h − lo)
    Σx² = (n−1)·n·(2n−1)/6
    Σy  = total count
    Σxy = Σ h·cnt − lo·Σy             (shift identity)

so the whole fit is ONE narrow scan → hourly-cell hash aggregate →
per-key hash aggregate — no grid explode, no join, no window.  The
normal-equation numerators/denominators

    slope_num = n·Σxy − Σx·Σy         slope = slope_num / den
    den       = n·Σx² − (Σx)²         intercept = (Σy·Σx² − Σx·Σxy) / den

are exact DECIMAL(38,0) integers (order-free partials at any
parallelism); the two floats served are single IEEE divisions of those
integers, so everything hash-verifies cross-engine.  Magnitude
envelope: with span ≤ 10^6 hours (a century) and Σy ≤ 10^13 rows per
key, every staged product stays below 10^26 ≪ 10^38.  n = 1 (or an
all-in-one-hour series) has den = 0 → slope/intercept NULL in both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HOUR = 3600


def hourly_trend(df: DataFrame, key_col: str, ts_col: str) -> DataFrame:
    """Per key: (key, lo_hour, n_hours, total_cnt, slope_num, slope_den,
    slope, intercept) — OLS over hourly counts with silent hours as
    zeros.  slope_num/slope_den are exact DECIMAL(38,0) integers;
    slope/intercept each one IEEE division (NULL when den = 0)."""
    h = F.floor(F.unix_timestamp(F.col(ts_col)) / _HOUR).cast("long")
    cells = (
        df.select(F.col(key_col).alias("key"), h.alias("h"))
        .groupBy("key", "h")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_key = cells.groupBy("key").agg(
        F.min("h").alias("lo"),
        F.max("h").alias("hi"),
        F.sum("cnt").alias("sy_raw"),
        # h ~ 5e5 epoch-hours, cnt partial sums ≤ 1e13 → ≤ 1e19: stage
        # through decimal so partials never wrap int64
        F.sum(F.col("h").cast("decimal(20,0)") * F.col("cnt")).alias(
            "shy"
        ),
    )
    n = (F.col("hi") - F.col("lo") + 1).cast("decimal(7,0)")
    sx = ((n * (n - 1)) / 2).cast("decimal(13,0)")
    sx2 = ((n * (n - 1) * (2 * n - 1)) / 6).cast("decimal(19,0)")
    sy = F.col("sy_raw").cast("decimal(14,0)")
    sxy = (
        F.col("shy") - F.col("lo").cast("decimal(20,0)") * sy
    ).cast("decimal(20,0)")
    num = (n * sxy - sx * sy).cast("decimal(38,0)")
    den = (n * sx2 - sx * sx).cast("decimal(38,0)")
    inum = (sy * sx2 - sx * sxy).cast("decimal(38,0)")
    return per_key.select(
        "key",
        F.col("lo").cast("long").alias("lo_hour"),
        (F.col("hi") - F.col("lo") + 1).cast("long").alias("n_hours"),
        F.col("sy_raw").cast("long").alias("total_cnt"),
        num.cast("string").alias("slope_num"),
        den.cast("string").alias("slope_den"),
        F.when(den != 0, num.cast("double") / den.cast("double")).alias(
            "slope"
        ),
        F.when(den != 0, inum.cast("double") / den.cast("double")).alias(
            "intercept"
        ),
    )


def hourly_trend_sql(events_cte: str, key_col: str, ts_col: str) -> str:
    """DuckDB restatement; a final CTE ``htrend(key, lo_hour, n_hours,
    total_cnt, slope_num, slope_den, slope, intercept)`` with the
    identical closed-form arithmetic.  DuckDB's decimal ``/`` degrades
    to DOUBLE, so every exact step here runs in HUGEINT with integer
    ``//`` (the closed-form numerators are exact multiples, so ``//``
    loses nothing); only the final serving columns cast out."""
    h = f"CAST(floor(epoch(CAST({ts_col} AS TIMESTAMP)) / {_HOUR}) AS BIGINT)"
    return f"""tcells AS (
      SELECT {key_col} AS key, {h} AS h, count(*) AS cnt
      FROM {events_cte} GROUP BY 1, 2),
    tkey AS (
      SELECT key, MIN(h) AS lo, MAX(h) AS hi,
             CAST(SUM(cnt) AS HUGEINT) AS sy,
             CAST(SUM(CAST(h AS HUGEINT) * cnt) AS HUGEINT) AS shy
      FROM tcells GROUP BY key),
    tterms AS (
      SELECT key, lo, hi, sy,
             CAST(hi - lo + 1 AS HUGEINT) AS n,
             (CAST(hi - lo + 1 AS HUGEINT)
              * (CAST(hi - lo + 1 AS HUGEINT) - 1)) // 2 AS sx,
             (CAST(hi - lo + 1 AS HUGEINT)
              * (CAST(hi - lo + 1 AS HUGEINT) - 1)
              * (2 * CAST(hi - lo + 1 AS HUGEINT) - 1)) // 6 AS sx2,
             shy - CAST(lo AS HUGEINT) * sy AS sxy
      FROM tkey),
    htrend AS (
      SELECT key,
             CAST(lo AS BIGINT) AS lo_hour,
             CAST(hi - lo + 1 AS BIGINT) AS n_hours,
             CAST(sy AS BIGINT) AS total_cnt,
             CAST(CAST(n * sxy - sx * sy AS DECIMAL(38,0)) AS VARCHAR)
               AS slope_num,
             CAST(CAST(n * sx2 - sx * sx AS DECIMAL(38,0)) AS VARCHAR)
               AS slope_den,
             CASE WHEN n * sx2 - sx * sx <> 0
                  THEN CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sx2 - sx * sx AS DOUBLE) END AS slope,
             CASE WHEN n * sx2 - sx * sx <> 0
                  THEN CAST(sy * sx2 - sx * sxy AS DOUBLE)
                       / CAST(n * sx2 - sx * sx AS DOUBLE) END
               AS intercept
      FROM tterms)"""

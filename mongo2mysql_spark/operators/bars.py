"""OHLC time-bar downsampling — the candlestick/telemetry-bar readout
of event streams (extension layer — the reference's 556-LoC ETL core,
Porter.php, has no time-series surface).

The kdb/TimescaleDB ``ohlc`` shape: per (series key, time bucket) the
first, highest, lowest and last observation plus count and sum.  Every
column is decidable in exact integer arithmetic so the whole bar frame
hash-verifies cross-engine:

- values quantize once to ``10^-scale`` (deterministic double→DECIMAL
  cast, the same contract as operators/resample and operators/anomaly);
- open/close resolve as ``min_by``/``max_by`` over the lexicographic
  (ts, id) struct — id unique ⇒ no tie ambiguity in either engine, and
  the argext is an AGGREGATE: it partial-aggregates map-side where a
  bucket-partitioned ``row_number`` window would sort whole buckets in
  single tasks (the r6 argmin-by-window lesson);
- high/low/sum/count are plain map-side-combinable aggregates;
- the one float the operator serves (``mean_value``) is a single IEEE
  division of exact integers.

Plan shape: one narrow scan → one hash aggregate keyed on
(key, bucket).  No window, no join, no second scan — at 100 TB the
cost is the single shuffle of bucket-cardinality partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ohlc_bars(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    interval_seconds: int = 3600,
    scale: int = 6,
) -> DataFrame:
    """Per (key, bucket): ``bucket_start``, ``n_obs``, ``sum_q`` and the
    quantized OHLC columns ``open_q/high_q/low_q/close_q`` plus the
    derived exact integers ``range_q = high−low`` and ``gain_q =
    close−open``; ``mean_value`` is the one IEEE division.
    """
    mult = 10**scale
    bucket = (F.unix_timestamp(F.col(ts_col)) / interval_seconds).cast("long")
    vq = (F.col(value_col).cast(f"decimal(18,{scale})") * mult).cast("long")
    order = F.struct(F.col(ts_col), F.col(id_col))
    bars = (
        df.select(
            F.col(key_col).alias("key"),
            bucket.alias("__b"),
            F.col(ts_col),
            F.col(id_col),
            vq.alias("__vq"),
        )
        .groupBy("key", "__b")
        .agg(
            F.min_by("__vq", order).alias("open_q"),
            F.max("__vq").alias("high_q"),
            F.min("__vq").alias("low_q"),
            F.max_by("__vq", order).alias("close_q"),
            F.count(F.lit(1)).alias("n_obs"),
            F.sum("__vq").cast("long").alias("sum_q"),
        )
    )
    return bars.select(
        "key",
        F.timestamp_seconds(F.col("__b") * interval_seconds).alias(
            "bucket_start"
        ),
        F.col("n_obs").cast("long").alias("n_obs"),
        "open_q",
        "high_q",
        "low_q",
        "close_q",
        (F.col("high_q") - F.col("low_q")).alias("range_q"),
        (F.col("close_q") - F.col("open_q")).alias("gain_q"),
        "sum_q",
        (
            F.col("sum_q").cast("double")
            / (F.col("n_obs") * F.lit(mult)).cast("double")
        ).alias("mean_value"),
    )


def ohlc_bars_sql(
    events_cte: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    interval_seconds: int = 3600,
    scale: int = 6,
) -> str:
    """DuckDB restatement; a final CTE ``obars(key, bucket_start, n_obs,
    open_q, high_q, low_q, close_q, range_q, gain_q, sum_q, mean_value)``
    with the identical arithmetic chain (struct min/max is lexicographic
    in both engines; id uniqueness makes the argext deterministic)."""
    mult = 10**scale
    return f"""oq AS (
      SELECT {key_col} AS key,
             CAST(floor(epoch(CAST({ts_col} AS TIMESTAMP))) AS BIGINT)
               // {interval_seconds} AS b,
             CAST({ts_col} AS TIMESTAMP) AS ts, {id_col} AS id,
             CAST(CAST({value_col} AS DECIMAL(18,{scale})) * {mult}
                  AS BIGINT) AS vq
      FROM {events_cte}),
    obars AS (
      SELECT key,
             make_timestamp(b * {interval_seconds} * 1000000)
               AS bucket_start,
             CAST(count(*) AS BIGINT) AS n_obs,
             (min({{'t': ts, 'i': id, 'v': vq}})).v AS open_q,
             max(vq) AS high_q,
             min(vq) AS low_q,
             (max({{'t': ts, 'i': id, 'v': vq}})).v AS close_q,
             max(vq) - min(vq) AS range_q,
             (max({{'t': ts, 'i': id, 'v': vq}})).v
               - (min({{'t': ts, 'i': id, 'v': vq}})).v AS gain_q,
             CAST(sum(vq) AS BIGINT) AS sum_q,
             CAST(sum(vq) AS DOUBLE)
               / CAST(count(*) * {mult} AS DOUBLE) AS mean_value
      FROM oq GROUP BY key, b)"""


def twap_bars(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    interval_seconds: int = 3600,
    scale: int = 6,
) -> DataFrame:
    """Time-weighted average per (key, bucket) — TimescaleDB's
    ``time_weight('locf')`` shape, the correct mean for irregularly
    sampled state series where the plain mean over-weights chatty
    periods (ohlc_bars' mean_value weights every OBSERVATION equally;
    this weights every SECOND).

    Each observation holds its value until the next observation or the
    bucket end, whichever is first (bucket-local LOCF — weights never
    cross buckets, so the aggregate stays per-bucket decomposable):

        twap = Σ w_i · v_i / Σ w_i,   w_i = min(next_ts, bucket_end) − ts_i

    Values quantize once to 10^-scale, weights are exact integer
    seconds, so the rational twap_num/twap_den hash-verifies digit-
    exact and the served ``twap`` is one IEEE division.  Plan: one
    key-partitioned lead() window (the sessionize shape) + one hash
    aggregate on (key, bucket).  A lone observation exactly at the
    bucket boundary yields den = 0 → twap NULL in both engines.

    Returns (key, bucket_start, n_obs, twap_num, twap_den, twap).
    """
    from pyspark.sql import Window as W

    mult = 10**scale
    epoch = F.unix_timestamp(F.col(ts_col)).cast("long")
    vq = (F.col(value_col).cast(f"decimal(18,{scale})") * mult).cast("long")
    nxt = F.lead("__e").over(
        W.partitionBy("key").orderBy(ts_col, id_col)
    )
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col),
        F.col(id_col),
        epoch.alias("__e"),
        vq.alias("__vq"),
    ).withColumn("__next", nxt)
    b = (F.col("__e") / interval_seconds).cast("long")
    bucket_end = (b + 1) * interval_seconds
    wt = (
        F.least(F.coalesce("__next", bucket_end), bucket_end) - F.col("__e")
    ).cast("long")
    bars = (
        base.select(
            "key",
            b.alias("__b"),
            wt.alias("__w"),
            "__vq",
        )
        .groupBy("key", "__b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.sum(
                F.col("__w").cast("decimal(19,0)") * F.col("__vq")
            ).cast("decimal(38,0)").alias("__num"),
            F.sum("__w").cast("long").alias("twap_den"),
        )
    )
    return bars.select(
        "key",
        F.timestamp_seconds(F.col("__b") * interval_seconds).alias(
            "bucket_start"
        ),
        "n_obs",
        F.col("__num").cast("string").alias("twap_num"),
        "twap_den",
        F.when(
            F.col("twap_den") > 0,
            F.col("__num").cast("double")
            / (F.col("twap_den").cast("decimal(19,0)") * mult).cast("double"),
        ).alias("twap"),
    )


def twap_bars_sql(
    events_cte: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    interval_seconds: int = 3600,
    scale: int = 6,
) -> str:
    """DuckDB restatement; a final CTE ``tbars(key, bucket_start,
    n_obs, twap_num, twap_den, twap)`` with the identical chain."""
    mult = 10**scale
    return f"""tb0 AS (
      SELECT {key_col} AS key,
             CAST(floor(epoch(CAST({ts_col} AS TIMESTAMP))) AS BIGINT) AS e,
             CAST(CAST({value_col} AS DECIMAL(18,{scale})) * {mult}
                  AS BIGINT) AS vq,
             lead(CAST(floor(epoch(CAST({ts_col} AS TIMESTAMP))) AS BIGINT))
               OVER (PARTITION BY {key_col}
                     ORDER BY CAST({ts_col} AS TIMESTAMP), {id_col})
               AS next_e
      FROM {events_cte}),
    tb1 AS (
      SELECT key, e // {interval_seconds} AS b, vq,
             LEAST(COALESCE(next_e, (e // {interval_seconds} + 1)
                                    * {interval_seconds}),
                   (e // {interval_seconds} + 1) * {interval_seconds}) - e
               AS w
      FROM tb0),
    tbars AS (
      SELECT key,
             make_timestamp(b * {interval_seconds} * 1000000)
               AS bucket_start,
             CAST(count(*) AS BIGINT) AS n_obs,
             CAST(CAST(SUM(CAST(w AS HUGEINT) * vq) AS DECIMAL(38,0))
                  AS VARCHAR) AS twap_num,
             CAST(SUM(w) AS BIGINT) AS twap_den,
             CASE WHEN SUM(w) > 0
                  THEN CAST(CAST(SUM(CAST(w AS HUGEINT) * vq)
                                 AS DECIMAL(38,0)) AS DOUBLE)
                       / CAST(CAST(SUM(w) AS HUGEINT) * {mult} AS DOUBLE)
             END AS twap
      FROM tb1 GROUP BY key, b)"""

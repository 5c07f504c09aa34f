"""Seasonal-naive forecasting with an exact backtest — the capacity-
planning readout of event time series (extension layer — the
reference's 556-LoC ETL core has no time-series surface).

The model is the strongest transcendental-free baseline: predict each
(series, hour-of-day) cell of the test span by the series' mean count
at that hour-of-day over the train span.  Means, errors and MAE stay
inside the repo's hash-portable arithmetic contract:

- ONE raw scan: hourly (key, epoch-hour) counts, map-side combined to
  hour cardinality; span, key set and grid all derive from that frame;
- the expected-hour grid (explode(sequence(lo..hi)) per key — rows ∝
  keys × span hours, never a cross join) makes EMPTY hours count as
  zero observations in both the fitted mean and the backtest (a
  forecast that skips silent hours overstates itself);
- the train/test split hour is ``lo + (hi−lo)·num DIV den`` — pure
  integer arithmetic;
- prediction = train_cnt / n_train_hours — exact integers, ONE IEEE
  division; absolute error |actual − pred| one IEEE subtract per cell;
  MAE accumulates through the house DECIMAL(30,10) dsum (order-free
  partials at any parallelism) over the test-span grid.

Everything hashes bit-for-bit against a DuckDB restatement of the same
chain (seasonal_backtest_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo2mysql_spark.functions.scalar import dsum

_HOUR = 3600


def seasonal_backtest(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    split_frac_num: int = 3,
    split_frac_den: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Fit on the first ``num/den`` of the hourly span, score on the
    rest.  Returns (forecast, backtest):

    - forecast: (key, hod, train_cnt, n_train_hours, pred) — the fitted
      per-hour-of-day rates;
    - backtest: (key, n_test_hours, total_actual, mae) — test-span mean
      absolute error of the seasonal-naive prediction.
    """
    hours = F.floor(F.unix_timestamp(F.col(ts_col)) / _HOUR).cast("long")
    cells = (
        events.select(F.col(key_col).alias("key"), hours.alias("h"))
        .groupBy("key", "h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # hour-cardinality frame; feeds span/keys/fit (3 concurrent
        # consumers).  localCheckpoint(eager=False) materializes the
        # stage once at call time (under AQE even a "lazy" checkpoint
        # resolves and runs its stages immediately); a persist() here
        # measured WORSE: the three consumers race the first cache
        # fill inside one materialization and each recomputes the
        # aggregation (r12 probe: resample_gapfill 12.6 -> 21.8 s)
        .localCheckpoint(eager=False)
    )
    span = cells.agg(F.min("h").alias("lo"), F.max("h").alias("hi")).select(
        "lo",
        "hi",
        F.expr(f"lo + ((hi - lo) * {split_frac_num}) DIV {split_frac_den}")
        .cast("long")
        .alias("split_h"),
    )
    grid = (
        cells.select("key")
        .distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "key", F.explode(F.sequence("lo", "hi")).alias("h"), "split_h"
        )
    )
    full = grid.join(cells, ["key", "h"], "left").select(
        "key",
        "h",
        (F.col("h") % 24).alias("hod"),
        F.coalesce("cnt", F.lit(0)).alias("cnt"),
        "split_h",
    )
    train = full.filter(F.col("h") < F.col("split_h"))
    test = full.filter(F.col("h") >= F.col("split_h"))

    forecast = (
        train.groupBy("key", "hod")
        .agg(
            F.sum("cnt").alias("train_cnt"),
            F.count(F.lit(1)).alias("n_train_hours"),
        )
        .select(
            "key",
            F.col("hod").cast("int").alias("hod"),
            F.col("train_cnt").cast("long").alias("train_cnt"),
            F.col("n_train_hours").cast("long").alias("n_train_hours"),
            (
                F.col("train_cnt").cast("double")
                / F.col("n_train_hours").cast("double")
            ).alias("pred"),
        )
    )
    err = test.join(
        forecast.select("key", "hod", "pred"), ["key", "hod"]
    ).select(
        "key",
        "cnt",
        F.abs(F.col("cnt").cast("double") - F.col("pred")).alias("err"),
    )
    backtest = err.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_test_hours"),
        F.sum("cnt").cast("long").alias("total_actual"),
        (dsum(F.col("err")) / F.count(F.lit(1)).cast("double")).alias("mae"),
    )
    return forecast, backtest


def seasonal_backtest_sql(
    events_cte: str,
    key_col: str,
    ts_col: str,
    split_frac_num: int = 3,
    split_frac_den: int = 4,
) -> str:
    """DuckDB restatement; final CTEs ``fcast(key, hod, train_cnt,
    n_train_hours, pred)`` and ``fback(key, n_test_hours, total_actual,
    mae)`` with the identical arithmetic chain."""
    h = f"CAST(floor(epoch(CAST({ts_col} AS TIMESTAMP)) / {_HOUR}) AS BIGINT)"
    return f"""fcells AS MATERIALIZED (
      SELECT {key_col} AS key, {h} AS h, count(*) AS cnt
      FROM {events_cte} GROUP BY 1, 2),
    fspan AS (
      SELECT lo, hi,
             CAST(lo + ((hi - lo) * {split_frac_num})
                  // {split_frac_den} AS BIGINT) AS split_h
      FROM (SELECT MIN(h) AS lo, MAX(h) AS hi FROM fcells)),
    fgrid AS (
      SELECT k.key, unnest(range(s.lo, s.hi + 1)) AS h, s.split_h
      FROM (SELECT DISTINCT key FROM fcells) k
      CROSS JOIN fspan s),
    ffull AS MATERIALIZED (
      SELECT g.key, g.h, g.h % 24 AS hod, COALESCE(c.cnt, 0) AS cnt,
             g.split_h
      FROM fgrid g LEFT JOIN fcells c USING (key, h)),
    fcast AS MATERIALIZED (
      SELECT key, CAST(hod AS INTEGER) AS hod,
             CAST(train_cnt AS BIGINT) AS train_cnt,
             CAST(n_train_hours AS BIGINT) AS n_train_hours,
             CAST(train_cnt AS DOUBLE) / CAST(n_train_hours AS DOUBLE)
               AS pred
      FROM (SELECT key, hod, sum(cnt) AS train_cnt,
                   count(*) AS n_train_hours
            FROM ffull WHERE h < split_h GROUP BY key, hod)),
    ferr AS (
      SELECT f.key, f.cnt,
             abs(CAST(f.cnt AS DOUBLE) - p.pred) AS err
      FROM (SELECT * FROM ffull WHERE h >= split_h) f
      JOIN fcast p ON p.key = f.key AND p.hod = f.hod),
    fback AS (
      SELECT key,
             CAST(count(*) AS BIGINT) AS n_test_hours,
             CAST(sum(cnt) AS BIGINT) AS total_actual,
             CAST(ROUND(SUM(CAST(err AS DECIMAL(30,10))), 4) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS mae
      FROM ferr GROUP BY key)"""

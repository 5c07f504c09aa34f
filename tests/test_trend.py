"""Exact OLS hourly trend (operators/trend): hand-checked slope,
silent-hour zero accounting, degenerate span, closed-form-vs-grid
equality, and the DuckDB restatement on a random stream."""

from __future__ import annotations

import random
from datetime import datetime, timedelta
from fractions import Fraction

import duckdb

from mongo2mysql_spark.operators.trend import hourly_trend, hourly_trend_sql

SCHEMA = "event_id long, ts timestamp, event_type string"


def _trend(spark, rows):
    return hourly_trend(
        spark.createDataFrame(rows, SCHEMA), "event_type", "ts"
    )


def _ref_ols(counts):
    """Driver-side reference: exact Fraction OLS over y = counts[x]."""
    n = len(counts)
    sx = Fraction(n * (n - 1), 2)
    sx2 = Fraction((n - 1) * n * (2 * n - 1), 6)
    sy = Fraction(sum(counts))
    sxy = Fraction(sum(i * c for i, c in enumerate(counts)))
    den = n * sx2 - sx * sx
    if den == 0:
        return None, None
    return (n * sxy - sx * sy) / den, (sy * sx2 - sx * sxy) / den


def _rows_from_counts(counts, key="a", base=datetime(2024, 3, 1)):
    rows, eid = [], 0
    for hour, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + timedelta(hours=hour, minutes=1), key))
            eid += 1
    return rows


def test_hand_checked_increasing_series(spark):
    counts = [1, 2, 3, 4, 5]  # perfect line: slope 1, intercept 1
    r = _trend(spark, _rows_from_counts(counts)).collect()[0]
    assert r.slope == 1.0
    assert r.intercept == 1.0
    assert r.n_hours == 5
    assert r.total_cnt == 15


def test_silent_hours_count_as_zeros(spark):
    # observations only at hours 0 and 4 (3 silent hours between):
    # a busy-hours-only fit would see [2, 2] (slope 0); the zero-counted
    # series [2, 0, 0, 0, 2] has slope 0 but intercept 4/5
    counts = [2, 0, 0, 0, 2]
    r = _trend(spark, _rows_from_counts(counts)).collect()[0]
    slope, intercept = _ref_ols(counts)
    assert r.slope == float(slope)
    assert r.intercept == float(intercept)
    assert r.n_hours == 5  # the span, not the observed-cell count
    decreasing = [5, 0, 0, 0, 1]
    r2 = _trend(spark, _rows_from_counts(decreasing)).collect()[0]
    s2, _ = _ref_ols(decreasing)
    assert r2.slope == float(s2) and r2.slope < 0


def test_single_hour_span_has_null_slope(spark):
    rows = [(i, datetime(2024, 3, 1, 10, i), "a") for i in range(5)]
    r = _trend(spark, rows).collect()[0]
    assert r.slope is None and r.intercept is None
    assert r.slope_den == "0"
    assert r.n_hours == 1 and r.total_cnt == 5


def test_matches_reference_on_random_series(spark):
    rng = random.Random(3)
    counts = [rng.randrange(0, 9) for _ in range(48)]
    counts[0] += 1
    counts[-1] += 1  # pin the span to len(counts)
    r = _trend(spark, _rows_from_counts(counts)).collect()[0]
    slope, intercept = _ref_ols(counts)
    num = int(r.slope_num)
    den = int(r.slope_den)
    assert Fraction(num, den) == slope
    assert r.slope == num / den  # the served float IS the one division


def test_restatement_equality_random_stream(spark, tmp_path):
    base = datetime(2024, 3, 1)
    rng = random.Random(17)
    rows = [
        (
            i,
            base + timedelta(seconds=rng.randrange(0, 12 * 86400)),
            rng.choice(["x", "y", "z"]),
        )
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    pq = str(tmp_path / "ev.parquet")
    df.write.mode("overwrite").parquet(pq)
    got = sorted(
        (
            (r.key, r.lo_hour, r.n_hours, r.total_cnt, r.slope_num,
             r.slope_den, r.slope, r.intercept)
            for r in _trend(spark, rows).collect()
        )
    )
    duck = duckdb.connect()
    duck.execute(
        f"CREATE VIEW events AS SELECT * FROM parquet_scan('{pq}/*.parquet')"
    )
    sql = (
        "WITH "
        + hourly_trend_sql("events", "event_type", "ts")
        + """ SELECT key, lo_hour, n_hours, total_cnt, slope_num,
                     slope_den, slope, intercept
              FROM htrend ORDER BY key"""
    )
    want = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert got == want

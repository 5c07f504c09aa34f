"""Seasonal-naive backtest (operators/forecast): planted periodic
series, empty-hour zero accounting, exact MAE, DuckDB restatement."""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb

from mongo2mysql_spark.operators.forecast import (
    seasonal_backtest,
    seasonal_backtest_sql,
)

SCHEMA = "event_id long, ts timestamp, event_type string"


def _events(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _periodic_rows():
    """4 days of hourly events: type 'a' fires twice at hour 3, once at
    every other hour; type 'b' fires only at hour 12.  The 3/4 split
    trains on days 0-2, tests day 3 (perfectly periodic → MAE 0)."""
    rows = []
    eid = 0
    base = datetime(2024, 3, 1)
    for day in range(4):
        for hour in range(24):
            ts = base + timedelta(days=day, hours=hour)
            n = 2 if hour == 3 else 1
            for _ in range(n):
                rows.append((eid, ts, "a"))
                eid += 1
            if hour == 12:
                rows.append((eid, ts, "b"))
                eid += 1
    return rows


def test_perfectly_periodic_series_has_zero_mae(spark):
    fc, bt = seasonal_backtest(
        _events(spark, _periodic_rows()), "event_type", "ts",
        split_frac_num=3, split_frac_den=4,
    )
    back = {r.key: r for r in bt.collect()}
    assert back["a"].mae == 0.0
    assert back["b"].mae == 0.0
    fore = {(r.key, r.hod): r for r in fc.collect()}
    assert fore[("a", 3)].pred == 2.0
    assert fore[("a", 5)].pred == 1.0
    # 'b' is SILENT at hour 5 — the grid supplies zero cells, so the
    # fitted rate must be 0, not undefined/missing
    assert fore[("b", 5)].pred == 0.0
    assert fore[("b", 12)].pred == 1.0


def test_shifted_test_day_mae(spark):
    # 2 days train at 1/hour, 1 day test at 3/hour -> |3-1| = 2 every hour
    rows = []
    eid = 0
    base = datetime(2024, 3, 1)
    for day in range(3):
        for hour in range(24):
            ts = base + timedelta(days=day, hours=hour)
            for _ in range(3 if day == 2 else 1):
                rows.append((eid, ts, "x"))
                eid += 1
    _, bt = seasonal_backtest(
        _events(spark, rows), "event_type", "ts",
        split_frac_num=2, split_frac_den=3,
    )
    # span = 71 hours (lo..hi inclusive); split_h = lo + 71*2//3 = lo+47,
    # so the test window is hours 47..71: the last hour of day 1 (err 0)
    # plus all 24 hours of day 2 (err |3-1| = 2 each) -> MAE 48/25
    row = bt.collect()[0]
    assert row.key == "x"
    assert row.n_test_hours == 25 and row.total_actual == 73
    assert row.mae == 48.0 / 25.0


def test_sql_restatement_matches(spark):
    rows = _periodic_rows()
    fc, bt = seasonal_backtest(
        _events(spark, rows), "event_type", "ts",
        split_frac_num=3, split_frac_den=4,
    )
    got_fc = sorted(tuple(r) for r in fc.collect())
    got_bt = sorted(tuple(r) for r in bt.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, TIMESTAMP '{ts}', '{t}')" for i, ts, t in rows
        )
        + ") t(event_id, ts, event_type)"
    )
    ctes = seasonal_backtest_sql(
        "events", "event_type", "ts", split_frac_num=3, split_frac_den=4
    )
    want_fc = sorted(
        tuple(r)
        for r in con.execute(
            "WITH " + ctes
            + " SELECT key, hod, train_cnt, n_train_hours, pred FROM fcast"
        ).fetchall()
    )
    want_bt = sorted(
        tuple(r)
        for r in con.execute(
            "WITH " + ctes
            + " SELECT key, n_test_hours, total_actual, mae FROM fback"
        ).fetchall()
    )
    assert got_fc == want_fc and got_bt == want_bt and got_fc

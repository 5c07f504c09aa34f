"""OHLC time-bar downsampling (operators/bars): hand-checked bars,
argext tie discipline, single-observation degeneration, and the DuckDB
restatement equality on a random stream."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import duckdb

from mongo2mysql_spark.operators.bars import ohlc_bars, ohlc_bars_sql

SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def _bars(spark, rows, interval=3600):
    df = spark.createDataFrame(rows, SCHEMA)
    return ohlc_bars(
        df, "event_type", "ts", "value", "event_id",
        interval_seconds=interval,
    )


def test_hand_checked_bar(spark):
    base = datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        # one hour bucket for 'a': first obs 5.0, high 9.5, low -2.25,
        # last obs 7.0 (ordering is by ts, not by value or id)
        (1, base + timedelta(minutes=1), "a", 5.0),
        (2, base + timedelta(minutes=10), "a", 9.5),
        (3, base + timedelta(minutes=20), "a", -2.25),
        (4, base + timedelta(minutes=50), "a", 7.0),
    ]
    out = {(r.key, r.bucket_start): r for r in _bars(spark, rows).collect()}
    bar = out[("a", base)]
    assert bar.open_q == 5_000_000
    assert bar.high_q == 9_500_000
    assert bar.low_q == -2_250_000
    assert bar.close_q == 7_000_000
    assert bar.range_q == 11_750_000
    assert bar.gain_q == 2_000_000
    assert bar.n_obs == 4
    assert bar.sum_q == 19_250_000
    assert bar.mean_value == 19_250_000 / (4 * 1_000_000)


def test_same_ts_ties_resolve_by_id(spark):
    ts = datetime(2024, 3, 1, 10, 30, 0)
    rows = [
        (7, ts, "a", 3.0),
        (2, ts, "a", 1.0),  # lowest id at the shared ts → open
        (9, ts, "a", 2.0),  # highest id → close
    ]
    bar = _bars(spark, rows).collect()[0]
    assert bar.open_q == 1_000_000
    assert bar.close_q == 2_000_000


def test_single_observation_bucket_degenerates(spark):
    rows = [(1, datetime(2024, 3, 1, 10, 5), "a", 4.25)]
    bar = _bars(spark, rows).collect()[0]
    assert (
        bar.open_q == bar.high_q == bar.low_q == bar.close_q == 4_250_000
    )
    assert bar.range_q == 0 and bar.gain_q == 0
    assert bar.n_obs == 1


def test_invariants_and_bucket_split(spark):
    base = datetime(2024, 3, 1, 0, 0, 0)
    rng = random.Random(7)
    rows = [
        (
            i,
            base + timedelta(minutes=rng.randrange(0, 600)),
            rng.choice(["a", "b", "c"]),
            round(rng.uniform(-50, 50), 4),
        )
        for i in range(400)
    ]
    bars = _bars(spark, rows).collect()
    assert sum(b.n_obs for b in bars) == len(rows)
    for b in bars:
        assert b.low_q <= min(b.open_q, b.close_q)
        assert b.high_q >= max(b.open_q, b.close_q)
        assert b.range_q == b.high_q - b.low_q
        assert b.gain_q == b.close_q - b.open_q


def test_restatement_equality_random_stream(spark, tmp_path):
    base = datetime(2024, 3, 1, 0, 0, 0)
    rng = random.Random(11)
    rows = [
        (
            i,
            base + timedelta(seconds=rng.randrange(0, 6 * 86400)),
            rng.choice(["x", "y"]),
            round(rng.uniform(-1000, 1000), 6),
        )
        for i in range(1500)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    pq = str(tmp_path / "ev.parquet")
    df.write.mode("overwrite").parquet(pq)
    got = sorted(
        (
            (r.key, r.bucket_start, r.n_obs, r.open_q, r.high_q, r.low_q,
             r.close_q, r.range_q, r.gain_q, r.sum_q, r.mean_value)
            for r in _bars(spark, rows).collect()
        )
    )
    duck = duckdb.connect()
    duck.execute(
        f"CREATE VIEW events AS SELECT * FROM parquet_scan('{pq}/*.parquet')"
    )
    sql = (
        "WITH "
        + ohlc_bars_sql("events", "event_type", "ts", "value", "event_id")
        + """ SELECT key, bucket_start, n_obs, open_q, high_q, low_q,
                     close_q, range_q, gain_q, sum_q, mean_value
              FROM obars ORDER BY key, bucket_start"""
    )
    want = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert got == want


def test_twap_weights_time_not_observations(spark):
    """A value held for 50 minutes dominates one held for 10, whatever
    the observation counts say; weights truncate at the bucket end and
    the last holder runs to it."""
    from datetime import datetime, timedelta

    from mongo2mysql_spark.operators.bars import twap_bars

    base = datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        (1, base, "a", 100.0),                       # held 10 min
        (2, base + timedelta(minutes=10), "a", 0.0), # held 50 min to end
    ]
    df = spark.createDataFrame(rows, SCHEMA.replace("event_type", "k"))
    out = twap_bars(df, "k", "ts", "value", "event_id").collect()[0]
    # twap = (600s*100 + 3000s*0) / 3600s = 16.666...
    assert out.twap_den == 3600
    assert int(out.twap_num) == 600 * 100_000_000
    assert out.twap == (600 * 100_000_000) / (3600 * 1_000_000)
    assert out.n_obs == 2
    # plain mean would say 50.0 — the whole point of the operator
    assert abs(out.twap - 50.0) > 30


def test_twap_restatement_equality(spark, tmp_path):
    import random
    from datetime import datetime, timedelta

    import duckdb

    from mongo2mysql_spark.operators.bars import twap_bars, twap_bars_sql

    base = datetime(2024, 3, 1)
    rng = random.Random(61)
    rows = [
        (
            i,
            base + timedelta(seconds=rng.randrange(0, 3 * 86400)),
            rng.choice(["x", "y"]),
            round(rng.uniform(-100, 100), 4),
        )
        for i in range(800)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    pq = str(tmp_path / "ev.parquet")
    df.write.mode("overwrite").parquet(pq)
    got = sorted(
        (r.key, r.bucket_start, r.n_obs, r.twap_num, r.twap_den, r.twap)
        for r in twap_bars(
            df, "event_type", "ts", "value", "event_id"
        ).collect()
    )
    duck = duckdb.connect()
    duck.execute(
        f"CREATE VIEW ev AS SELECT * FROM parquet_scan('{pq}/*.parquet')"
    )
    sql = (
        "WITH "
        + twap_bars_sql("ev", "event_type", "ts", "value", "event_id")
        + """ SELECT key, bucket_start, n_obs, twap_num, twap_den, twap
              FROM tbars ORDER BY key, bucket_start"""
    )
    want = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert got == want and len(got) > 50

"""Round-11 edge fixes: cross-engine empty/all-NULL parity for the
histogram-join estimator, the CMS key-domain guard, the encoding
profiler's zero-run edge, the sliding-window hours→intervals
derivation, the cmsstore epoch guard, and all-NULL-group survival in
the grouped-quantile consumers (mad_outliers, equi_depth_histogram) —
the r10 ADVICE list plus the left-join quantile-frame sweep."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.oracle_utils import compare


def _duck_view(con, name: str, path: str) -> None:
    con.execute(
        f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )


# ------------------------------------------------------- histjoin empty edge


def test_hist_join_estimate_empty_inputs_match_sql(spark, tmp_path):
    """Both engines emit ONE zero-filled total row on empty inputs —
    the SQL restatement's total-leg SUMs coalesce to 0 instead of the
    NULLs an aggregate over zero rows yields."""
    from mongo2mysql_spark.operators.histjoin import (
        hist_join_estimate,
        hist_join_estimate_sql,
    )

    a = spark.createDataFrame([], "ka long")
    b = spark.createDataFrame([], "kb long")
    got = hist_join_estimate(a, "ka", b, "kb", n_buckets=8, with_exact=True)
    rows = got.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["bucket"], r["n_a"], r["d_a"], r["n_b"], r["d_b"],
            r["est"], r["exact"]) == (-1, 0, 0, 0, 0, 0.0, 0)

    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    a.write.parquet(pa)
    b.write.parquet(pb)
    con = duckdb.connect()
    _duck_view(con, "ta", pa)
    _duck_view(con, "tb", pb)
    sql = hist_join_estimate_sql("ta", "ka", "tb", "kb", n_buckets=8)
    assert not compare(got, con, f"WITH {sql} SELECT * FROM hjout")


def test_hist_join_estimate_from_persisted_stats(spark, tmp_path):
    """ANALYZE once, estimate forever: per-table bucket stats written
    to parquet serve the SAME estimate as the on-the-fly path (same
    declared domain) with zero table contact; mismatched domains are
    rejected; out-of-domain keys clamp into edge buckets instead of
    dropping from the statistics."""
    import random

    from mongo2mysql_spark.operators.histjoin import (
        analyze_key_stats,
        hist_join_estimate,
        hist_join_estimate_from_stats,
    )

    random.seed(4)
    a = spark.createDataFrame(
        [(random.randint(0, 199),) for _ in range(2000)], "k long"
    )
    b = spark.createDataFrame([(i,) for i in range(200)], "k long")
    # on-the-fly reference (estimate-only default) over the union
    # domain [0, 199] — the same domain the ANALYZE run declares
    ref = {
        r["bucket"]: (r["n_a"], r["d_a"], r["n_b"], r["d_b"], r["est"])
        for r in hist_join_estimate(a, "k", b, "k", n_buckets=8).collect()
    }
    pa, pb = str(tmp_path / "sa"), str(tmp_path / "sb")
    analyze_key_stats(a, "k", n_buckets=8, lo=0, hi=199).write.parquet(pa)
    analyze_key_stats(b, "k", n_buckets=8, lo=0, hi=199).write.parquet(pb)
    sa, sb = spark.read.parquet(pa), spark.read.parquet(pb)
    got = {
        r["bucket"]: (r["n_a"], r["d_a"], r["n_b"], r["d_b"], r["est"])
        for r in hist_join_estimate_from_stats(sa, sb).collect()
    }
    assert got == ref
    # domain mismatch rejected
    sc = analyze_key_stats(b, "k", n_buckets=8, lo=0, hi=255)
    with pytest.raises(ValueError):
        hist_join_estimate_from_stats(sa, sc)
    # clamping: keys beyond the declared domain land in edge buckets
    wide = spark.createDataFrame([(-50,), (500,), (10,)], "k long")
    st = analyze_key_stats(wide, "k", n_buckets=4, lo=0, hi=99)
    rows = {r["bucket"]: r["n"] for r in st.collect()}
    assert sum(rows.values()) == 3 and rows[0] == 2 and rows[3] == 1
    # assume_meta (r12): the caller-asserted-domain fast path skips the
    # validation collects but serves identical rows — including the
    # one-empty-side and both-empty edges the default path special-cases
    fast = {
        r["bucket"]: (r["n_a"], r["d_a"], r["n_b"], r["d_b"], r["est"])
        for r in hist_join_estimate_from_stats(
            sa, sb, assume_meta=(0, 199, 8)
        ).collect()
    }
    assert fast == ref
    empty = analyze_key_stats(
        spark.createDataFrame([], "k long"), "k", n_buckets=8, lo=0, hi=199
    )
    for lhs, rhs in ((sa, empty), (empty, empty)):
        want = sorted(
            map(tuple, hist_join_estimate_from_stats(lhs, rhs).collect())
        )
        got_f = sorted(
            map(
                tuple,
                hist_join_estimate_from_stats(
                    lhs, rhs, assume_meta=(0, 199, 8)
                ).collect(),
            )
        )
        assert got_f == want


# ------------------------------------------------------- CMS key guard


def test_cms_rejects_out_of_domain_keys(spark):
    from py4j.protocol import Py4JJavaError

    from mongo2mysql_spark.operators.cms import CMS_KEY_MAX, cms_build

    neg = spark.createDataFrame([(5,), (-1,)], "k long")
    with pytest.raises(Exception) as ei:
        cms_build(neg, "k", depth=2, width=32).collect()
    assert "cms key outside" in str(ei.value) or isinstance(
        ei.value, Py4JJavaError
    )
    big = spark.createDataFrame([(CMS_KEY_MAX + 1,)], "k long")
    with pytest.raises(Exception):
        cms_build(big, "k", depth=2, width=32).collect()
    # boundary keys 0 and CMS_KEY_MAX are in-contract
    ok = spark.createDataFrame([(0,), (CMS_KEY_MAX,)], "k long")
    assert cms_build(ok, "k", depth=2, width=32).count() > 0


# ------------------------------------------- encoding_stats zero-run edge


def test_encoding_stats_all_null_column_parity(spark, tmp_path):
    """An all-NULL column opens zero runs; avg_run_len must be NULL on
    BOTH engines (Spark x/0 is NULL, recent DuckDB is IEEE inf — both
    now serve an explicit NULL)."""
    from mongo2mysql_spark.operators.profile import (
        encoding_stats,
        encoding_stats_sql,
    )

    df = spark.createDataFrame(
        [(i, None) for i in range(20)], "id long, v string"
    )
    got = encoding_stats(df, ["v"], ["id"], "id DIV 10")
    row = got.collect()[0]
    assert row["runs"] == 0 and row["avg_run_len"] is None

    p = str(tmp_path / "enc")
    df.write.parquet(p)
    con = duckdb.connect()
    _duck_view(con, "t", p)
    sql = encoding_stats_sql("t", ["v"], "id", "id // 10")
    assert not compare(got, con, sql)


# ------------------------------------- sliding window hours derivation


def test_sliding_distinct_hours_mean_hours_at_any_interval(spark, tmp_path):
    """window_hours=1 at interval_seconds=1800 covers TWO half-hour
    intervals (one hour), not one — and still matches the SQL
    restatement, which derives the same step count."""
    from mongo2mysql_spark.operators.rollup import (
        sliding_distinct,
        sliding_distinct_sql,
    )

    rows = [
        ("a", "2024-01-01 00:10:00", "u1"),
        ("a", "2024-01-01 00:40:00", "u2"),
        ("a", "2024-01-01 01:10:00", "u3"),
    ]
    df = spark.createDataFrame(rows, "key string, ts string, user string")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    got = sliding_distinct(
        df, "key", "ts", "user", window_hours=1, interval_seconds=1800
    )
    by_start = {
        r["window_start"].isoformat(): r["n_active"] for r in got.collect()
    }
    # u1's 00:00 cell votes in the 00:00 AND 00:30 windows (2 steps =
    # 1 hour); the 00:30 window therefore sees u1+u2
    assert by_start["2024-01-01T00:30:00"] == 2
    assert by_start["2024-01-01T01:00:00"] == 2  # u2 + u3
    p = str(tmp_path / "ev")
    df.write.parquet(p)
    con = duckdb.connect()
    _duck_view(con, "ev", p)
    sql = sliding_distinct_sql(
        "ev", "key", "ts", "user", window_hours=1, interval_seconds=1800
    )
    assert not compare(got, con, f"WITH {sql} SELECT * FROM sdau")


# ------------------------------------------------- cmsstore epoch guard


def test_cms_store_none_epoch_never_recorded(spark, tmp_path):
    """A refresh with writer set but epoch=None must not poison the
    per-writer epoch map: the fold applies, no epoch is recorded, and
    a later real epoch still applies then replay-guards."""
    import json
    import os

    from mongo2mysql_spark.streaming.cmsstore import refresh_cms_store

    store = str(tmp_path / "cms")
    os.makedirs(store)
    df = spark.createDataFrame([(1,), (2,)], "k long")
    assert refresh_cms_store(df, store, "k", depth=2, width=32,
                             writer="w0", epoch=None)
    with open(os.path.join(store, "MANIFEST.json")) as fh:
        manifest = json.load(fh)
    assert "w0" not in (manifest.get("epochs") or {})
    assert refresh_cms_store(df, store, "k", depth=2, width=32,
                             writer="w0", epoch=0)
    assert not refresh_cms_store(df, store, "k", depth=2, width=32,
                                 writer="w0", epoch=0)


# --------------------------------- all-NULL-group survival (quantiles)


def test_mad_outliers_all_null_group_survives(spark, tmp_path):
    """A group whose values are ALL NULL keeps its rows with NULL
    med/mad/verdicts — matching the slot oracle's shape, where the
    GROUP BY emits a NULL-median row and the joins keep every input
    row (grouped_exact_quantiles drops such groups, so the consumer
    joins must be LEFT)."""
    from mongo2mysql_spark.operators.anomaly import mad_outliers

    rows = [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 30.0),
            (4, "b", None), (5, "b", None)]
    df = spark.createDataFrame(rows, "event_id long, key string, value double")
    got = mad_outliers(df, ["key"], "value", ["event_id"], k=5)
    assert got.count() == 5  # every input row survives
    b_rows = {r["event_id"]: r for r in got.filter(F.col("key") == "b").collect()}
    assert set(b_rows) == {4, 5}
    for r in b_rows.values():
        assert r["med"] is None and r["mad"] is None
        assert r["is_degenerate"] is None and r["is_mad_outlier"] is None

    p = str(tmp_path / "mad")
    df.write.parquet(p)
    con = duckdb.connect()
    _duck_view(con, "ev", p)
    # the slot oracle's restatement shape (queries/ext.py 'mad' branch)
    sql = """
    WITH mmed AS (SELECT key, quantile_cont(value, 0.5) AS med
                  FROM ev GROUP BY 1),
    mdev AS (SELECT e.event_id, e.key, e.value,
                    m.med, abs(e.value - m.med) AS abs_dev
             FROM ev e JOIN mmed m USING (key)),
    mmad AS (SELECT key, quantile_cont(abs_dev, 0.5) AS mad
             FROM mdev GROUP BY 1)
    SELECT d.event_id, d.key, d.value, d.med, a.mad, d.abs_dev,
           a.mad = 0 AS is_degenerate,
           a.mad > 0 AND d.abs_dev > 5 * a.mad AS is_mad_outlier
    FROM mdev d JOIN mmad a USING (key)
    """
    assert not compare(got, con, sql)


def test_equi_depth_histogram_all_null_column_parity(spark, tmp_path):
    """All-NULL column: the DataFrame side serves an EMPTY frame; the
    SQL restatement must too (quantile_cont's NULL list is filtered,
    not fanned out into NULL-bound shell rows)."""
    from mongo2mysql_spark.operators.selection import (
        equi_depth_histogram,
        equi_depth_histogram_sql,
    )

    df = spark.createDataFrame([(i, None) for i in range(10)],
                               "id long, v double")
    got = equi_depth_histogram(df, "v", n_buckets=4)
    assert got.count() == 0
    p = str(tmp_path / "hist")
    df.write.parquet(p)
    con = duckdb.connect()
    _duck_view(con, "t", p)
    sql = equi_depth_histogram_sql("t", "v", n_buckets=4)
    assert not compare(got, con, f"WITH {sql} SELECT * FROM hist")


def test_equi_depth_histogram_sql_unchanged_on_populated_column(spark, tmp_path):
    """The NULL-list filter must not change the populated-column
    answer (the gate's 'histogram' branch)."""
    from mongo2mysql_spark.operators.selection import (
        equi_depth_histogram,
        equi_depth_histogram_sql,
    )

    df = spark.createDataFrame(
        [(i, float(i * i % 97)) for i in range(200)], "id long, v double"
    )
    got = equi_depth_histogram(df, "v", n_buckets=8)
    p = str(tmp_path / "hist2")
    df.write.parquet(p)
    con = duckdb.connect()
    _duck_view(con, "t", p)
    sql = equi_depth_histogram_sql("t", "v", n_buckets=8)
    assert not compare(got, con, f"WITH {sql} SELECT * FROM hist")


# ---------------------------------------------- self-review regressions


def test_analyze_key_stats_int32_key_no_wrap(spark):
    """A 32-bit key column must bucket via BIGINT arithmetic:
    (key-lo)*n_buckets beyond 2^31 would wrap in int math and clamp
    everything into bucket 0, silently diverging from the SQL
    restatements."""
    from mongo2mysql_spark.operators.histjoin import analyze_key_stats

    df = spark.createDataFrame(
        [(200_000_000,), (2_000_000_000,)], "k int"
    )
    rows = {r["bucket"]: r["n"] for r in analyze_key_stats(
        df, "k", n_buckets=16, lo=0, hi=2**31 - 1
    ).collect()}
    # 200M*16 // 2^31 = 1;  2e9*16 // 2^31 = 14
    assert rows == {1: 1, 14: 1}


def test_hist_join_from_stats_empty_artifact_estimates_zero(spark):
    """Empty ANALYZE artifacts (empty/all-NULL-key tables) estimate 0
    instead of raising.  BOTH empty → the single zero-filled total row
    (the hist_join_estimate empty-edge contract); exactly ONE empty →
    the non-empty side's per-bucket n/d rows with est 0 (matching the
    on-the-fly estimator, whose zero-row edge needs both sides empty —
    the r11 ADVICE fix, pinned end-to-end in test_r12_fixes)."""
    from mongo2mysql_spark.operators.histjoin import (
        analyze_key_stats,
        hist_join_estimate_from_stats,
    )

    empty = spark.createDataFrame([], "k long")
    full = spark.createDataFrame([(i,) for i in range(20)], "k long")
    se = analyze_key_stats(empty, "k", 4, lo=0, hi=19)
    sf_ = analyze_key_stats(full, "k", 4, lo=0, hi=19)
    rows = hist_join_estimate_from_stats(se, se).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["bucket"], r["n_a"], r["d_a"], r["n_b"], r["d_b"],
            r["est"]) == (-1, 0, 0, 0, 0, 0.0)
    for a, b, n_col in ((se, sf_, "n_b"), (sf_, se, "n_a")):
        got = {r["bucket"]: r for r in
               hist_join_estimate_from_stats(a, b).collect()}
        assert set(got) == {-1, 0, 1, 2, 3}  # 4 buckets + total
        assert all(r["est"] == 0.0 for r in got.values())
        assert got[-1][n_col] == 20


def test_cms_estimate_null_query_key_serves_zero(spark):
    """A NULL query key passes the domain guard (NULL-safe) and
    estimates 0 — the pre-guard behavior, not a crash."""
    from mongo2mysql_spark.operators.cms import cms_build, cms_estimate

    df = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    grid = cms_build(df, "k", depth=2, width=32)
    qry = spark.createDataFrame([(1,), (None,)], "k long")
    est = {r["k"]: r["est"] for r in
           cms_estimate(grid, qry, "k", depth=2, width=32).collect()}
    assert est[1] == 2 and est[None] == 0


def test_joinorder_rejects_colliding_interval_labels(spark):
    from mongo2mysql_spark.operators.joinorder import (
        chain_join_plan,
        chain_join_plan_sql,
    )

    a = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError, match="collide"):
        chain_join_plan(
            spark, [("ab", a), ("c", a), ("a", a), ("bc", a)],
            [("x", "x"), ("x", "x"), ("x", "x")],
        )
    with pytest.raises(ValueError, match="collide"):
        chain_join_plan_sql(
            [("t1", "ab"), ("t2", "c"), ("t3", "a"), ("t4", "bc")],
            [("x", "x"), ("x", "x"), ("x", "x")],
        )

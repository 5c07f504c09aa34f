"""Systematic weighted selection (operators/sampling): exact-k
property, weight proportionality, heavy-row epochs, DuckDB equality."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mongo2mysql_spark.operators.sampling import (
    sql_systematic_weighted_select,
    systematic_weighted_select,
)


def _df(spark, weights):
    return spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "doc_id long, w long"
    )


def test_total_picks_is_exactly_k(spark):
    weights = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 0, 7]
    for k in (1, 5, 13, 40):
        got = systematic_weighted_select(
            _df(spark, weights), "w", "doc_id", k
        ).agg(F.sum("picks")).collect()[0][0]
        assert got == k, k


def test_heavy_row_gets_multiple_picks_and_zero_weight_none(spark):
    # one row carries half the mass -> at k=10 it owns ~5 sample slots
    weights = [50, 10, 10, 10, 10, 10, 0]
    rows = {
        r.doc_id: r
        for r in systematic_weighted_select(
            _df(spark, weights), "w", "doc_id", 10
        ).collect()
    }
    assert rows[0].picks == 5
    assert rows[6].picks == 0 and not rows[6].selected
    assert sum(r.picks for r in rows.values()) == 10


def test_proportionality_band(spark):
    # picks_i is within 1 of w_i * k / total for every row (systematic
    # sampling's deterministic error bound)
    weights = [7, 13, 2, 41, 23, 5, 17, 31, 11, 3]
    total = sum(weights)
    k = 25
    for r in systematic_weighted_select(
        _df(spark, weights), "w", "doc_id", k
    ).collect():
        ideal = weights[r.doc_id] * k / total
        assert abs(r.picks - ideal) < 1.0, (r.doc_id, r.picks, ideal)


def test_k_validation(spark):
    with pytest.raises(ValueError):
        systematic_weighted_select(_df(spark, [1]), "w", "doc_id", 0)


def test_sql_restatement_matches(spark):
    weights = [3, 0, 8, 2, 2, 9, 1, 6]
    k = 7
    got = sorted(
        (r.doc_id, r.cum_before, r.picks, r.selected)
        for r in systematic_weighted_select(
            _df(spark, weights), "w", "doc_id", k
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {w})" for i, w in enumerate(weights))
        + ") v(doc_id, w)"
    )
    sql = (
        "WITH "
        + sql_systematic_weighted_select("t", "doc_id", "w", k)
        + " SELECT doc_id, cum_before, picks, selected FROM syssel"
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_mix_gini_hand_checked_and_degenerate(spark):
    """Gini = (tot² − Σn²)/tot²: hand-checked mixed group, single-label
    group at 0, and the even-mix maximum (1 − 1/k)."""
    from mongo2mysql_spark.operators.sampling import mix_gini

    rows = (
        [(0, "a")] * 2 + [(0, "b")] * 2          # even mix of 2 -> 1/2
        + [(1, "a")] * 5                          # single label -> 0
        + [(2, "a")] * 3 + [(2, "b")] * 1         # 1 - (9+1)/16 = 3/8
    )
    df = spark.createDataFrame(rows, "g long, lab string")
    got = {r.g: (r.n_rows, r.n_labels, r.gini)
           for r in mix_gini(df, "g", "lab").collect()}
    assert got[0] == (4, 2, 0.5)
    assert got[1] == (5, 1, 0.0)
    assert got[2] == (4, 2, (16 - 10) / 16)

"""RRF fusion operator tests (operators/fusion.py); cross-engine
parity is covered by the text_bm25_search 'rrf' oracle branch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo2mysql_spark.operators.fusion import rrf_fuse


def _leg(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "rank"])


def test_rrf_fuses_overlapping_and_disjoint_docs(spark):
    a = _leg(spark, [(1, 1), (2, 2), (3, 3)])
    b = _leg(spark, [(2, 1), (4, 2)])
    out = {r.doc_id: r for r in rrf_fuse({"a": a, "b": b}, k=60).collect()}
    assert set(out) == {1, 2, 3, 4}
    # doc 2 is in both legs: 1/62 + 1/61
    assert out[2].rrf_score == pytest.approx(1 / 62 + 1 / 61, abs=1e-9)
    assert (out[2].a_rank, out[2].b_rank) == (2, 1)
    # doc 4 only in leg b: missing leg contributes 0, rank stays NULL
    assert out[4].rrf_score == pytest.approx(1 / 62, abs=1e-9)
    assert out[4].a_rank is None
    # both-legs doc beats single-leg docs at comparable ranks
    assert out[2].rrf_score > out[1].rrf_score


def test_rrf_single_leg_is_identity_ordering(spark):
    a = _leg(spark, [(i, i) for i in range(1, 6)])
    rows = rrf_fuse({"only": a}, k=60).orderBy(F.desc("rrf_score")).collect()
    assert [r.doc_id for r in rows] == [1, 2, 3, 4, 5]
    assert rows[0].rrf_score == pytest.approx(1 / 61, abs=1e-9)


def test_rrf_three_legs_sum(spark):
    legs = {
        n: _leg(spark, [(1, r)]) for n, r in (("x", 1), ("y", 2), ("z", 3))
    }
    row = rrf_fuse(legs, k=10).collect()[0]
    assert row.rrf_score == pytest.approx(1 / 11 + 1 / 12 + 1 / 13, abs=1e-9)


def test_ranked_topk_bounds_and_orders(spark):
    from mongo2mysql_spark.operators.fusion import ranked_topk

    df = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.1), (5, 0.7)], ["doc_id", "s"]
    )
    rows = {r.doc_id: r.rank for r in ranked_topk(df, "doc_id", "s", 3).collect()}
    # top-3 by score desc, id-ascending tie between 2 and 3
    assert rows == {2: 1, 3: 2, 5: 3}
    # empty input -> empty output, no error
    assert ranked_topk(df.filter("s > 1"), "doc_id", "s", 3).count() == 0
    # no unpartitioned window in the plan (the reason this helper exists)
    plan = ranked_topk(df, "doc_id", "s", 3)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "TakeOrderedAndProject" in plan

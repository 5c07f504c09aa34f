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

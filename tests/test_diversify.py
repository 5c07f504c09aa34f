"""Diversity selection (operators/diversify): MMR + greedy k-center.

The cross-engine hash contract is pinned by test_oracle
(diversify_select); these tests pin the algorithmic properties the
hash can't see: the λ=1 degeneration, the diversification behavior
itself, cover-radius monotonicity, and the salted candidate prune.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo2mysql_spark.operators.diversify import (
    kcenter_select,
    l2sq_seq,
    mmr_topk,
    sql_l2sq,
)
from mongo2mysql_spark.operators.similarity import topk_bruteforce


def _vec_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], "id bigint, v array<float>"
    )


@pytest.fixture(scope="module")
def planted(spark):
    # cluster A hugs the query direction (near-duplicates), B and C point
    # elsewhere; a pure-relevance top-3 is all-A, a diversified pick isn't
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),       # the query
        (1, [0.99, 0.12, 0.0, 0.0]),     # A1
        (2, [0.98, 0.14, 0.0, 0.0]),     # A2
        (3, [0.97, 0.16, 0.0, 0.0]),     # A3
        (4, [0.6, 0.8, 0.0, 0.0]),       # B (less relevant, different)
        (5, [0.5, 0.0, 0.86, 0.0]),      # C
    ]
    return _vec_df(spark, rows)


def test_mmr_lambda_one_is_relevance_topk(spark, planted):
    q = planted.filter(F.col("id") == 0)
    got = (
        mmr_topk(planted, q, "id", "v", k=3, overfetch=2, lam=1.0)
        .orderBy("rank")
        .collect()
    )
    want = (
        topk_bruteforce(planted, q, "id", "v", k=3).orderBy("rank").collect()
    )
    assert [r.neighbor_id for r in got] == [r.neighbor_id for r in want]
    # at λ=1 the pick score IS the relevance
    assert [r.score for r in got] == [r.cosine for r in want]
    assert [r.relevance for r in got] == [r.cosine for r in want]


def test_mmr_diversifies_across_clusters(spark, planted):
    q = planted.filter(F.col("id") == 0)
    picked = {
        r.neighbor_id
        for r in mmr_topk(planted, q, "id", "v", k=3, overfetch=2, lam=0.3).collect()
    }
    # pick 1 is the best A; diversification must then escape cluster A
    assert 1 in picked
    assert picked & {4, 5}, f"all picks stayed in cluster A: {picked}"
    # pure relevance would have taken all of A
    rel3 = {
        r.neighbor_id
        for r in topk_bruteforce(planted, q, "id", "v", k=3).collect()
    }
    assert rel3 == {1, 2, 3}
    assert picked != rel3


def test_mmr_rank1_is_relevance_argmax(spark, planted):
    q = planted.filter(F.col("id") == 0)
    r1 = (
        mmr_topk(planted, q, "id", "v", k=2, overfetch=3, lam=0.5)
        .filter(F.col("rank") == 1)
        .collect()
    )
    assert len(r1) == 1 and r1[0].neighbor_id == 1
    assert r1[0].score == r1[0].relevance


def test_mmr_rejects_bad_lambda(spark, planted):
    q = planted.filter(F.col("id") == 0)
    with pytest.raises(ValueError):
        mmr_topk(planted, q, "id", "v", lam=1.5)


def test_kcenter_finds_planted_outliers(spark):
    # a tight blob near the origin plus two far-away points: farthest-first
    # must pick both far points before any second blob member
    rows = [(i, [0.01 * i, 0.0, 0.0, 0.0]) for i in range(10)]
    rows += [(100, [50.0, 0.0, 0.0, 0.0]), (101, [0.0, -40.0, 0.0, 0.0])]
    df = _vec_df(spark, rows)
    got = kcenter_select(df, "id", "v", k=3).orderBy("rank").collect()
    assert got[0].center_id == 0 and got[0].radius is None  # min-id seed
    assert {got[1].center_id, got[2].center_id} == {100, 101}


def test_kcenter_radius_nonincreasing(spark):
    rows = [(i, [float(i % 7), float(i % 5), float(i % 3), 1.0]) for i in range(40)]
    got = kcenter_select(_vec_df(spark, rows), "id", "v", k=5).orderBy("rank").collect()
    radii = [r.radius for r in got[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:])), radii
    assert len({r.center_id for r in got}) == 5  # no repeats


def test_l2sq_fold_matches_duckdb(spark):
    import duckdb

    rows = [(1, [0.1, -2.5, 3.25, 7.0]), (2, [-1.0, 0.5, 0.0, 2.0])]
    df = _vec_df(spark, rows)
    a, b = df.filter("id=1"), df.filter("id=2").withColumnRenamed("v", "w")
    got = (
        a.crossJoin(b.select("w"))
        .select(l2sq_seq(F.col("v"), F.col("w")).alias("d"))
        .collect()[0]
        .d
    )
    va = [float(x) for x in rows[0][1]]
    vb = [float(x) for x in rows[1][1]]
    want = duckdb.connect().execute(
        f"SELECT {sql_l2sq('CAST(? AS FLOAT[])', 'CAST(? AS FLOAT[])')}",
        [va, vb],
    ).fetchone()[0]
    assert got == want  # bit-identical, not approx


def test_mmr_candidate_prune_is_salted(spark, planted):
    """The candidate prune must plan as the salted two-phase rank
    (operators/skew.py) — same assertion style as the pq/hamming
    top-k plan tests.  Asserted on the un-checkpointed prune frame
    (mmr_topk lazily checkpoints it, which replaces the visible plan
    with a Scan ExistingRDD once materialized)."""
    from mongo2mysql_spark.operators.diversify import mmr_candidates

    q = planted.filter(F.col("id") == 0)
    cand, _ = mmr_candidates(planted, q, "id", "v", n_cand=4, checkpoint=False)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    salted = [
        line
        for line in plan.splitlines()
        if "windowspecdefinition" in line and "__salt" in line
    ]
    assert salted, plan
    assert any("query_id" in line for line in salted), plan

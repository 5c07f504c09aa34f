"""Round-12 edge fixes (the r11 ADVICE list): the stats-served
histogram-join estimator with exactly ONE empty artifact, the
analyze_key_stats pre-multiply key clamp (BIGINT overflow on keys far
outside the declared domain), the star-form subset-label collision
check, and the attribution oracle's window constant interpolation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# ------------------------------------------- from_stats one-empty-side edge


def test_from_stats_one_empty_artifact_matches_on_the_fly(spark):
    """With exactly one empty ANALYZE artifact the stats-served path
    must emit the non-empty side's per-bucket n/d rows (est 0) plus
    the total — exactly what the on-the-fly estimator serves when one
    side has no rows (its zero-row edge needs BOTH sides empty); the
    old code collapsed to a single all-zero total row, under-reporting
    the non-empty side and breaking the 'output matches
    with_exact=False' contract."""
    from mongo2mysql_spark.operators.histjoin import (
        analyze_key_stats,
        hist_join_estimate,
        hist_join_estimate_from_stats,
    )

    a = spark.createDataFrame([(i % 7,) for i in range(40)], "ka long")
    b = spark.createDataFrame([], "kb long")
    lo, hi = 0, 6
    sa = analyze_key_stats(a, "ka", n_buckets=4, lo=lo, hi=hi)
    sb = analyze_key_stats(b, "kb", n_buckets=4, lo=lo, hi=hi)
    assert sb.count() == 0  # genuinely one empty artifact

    served = {
        r["bucket"]: (r["n_a"], r["d_a"], r["n_b"], r["d_b"], r["est"])
        for r in hist_join_estimate_from_stats(sa, sb).collect()
    }
    onthefly = {
        r["bucket"]: (r["n_a"], r["d_a"], r["n_b"], r["d_b"], r["est"])
        for r in hist_join_estimate(a, "ka", b, "kb", n_buckets=4).collect()
    }
    assert served == onthefly
    assert len(served) > 1  # per-bucket rows present, not one zero row
    assert served[-1][0] == 40 and served[-1][4] == 0.0
    # ...and mirrored: empty artifact on the A side
    served_rev = {
        r["bucket"]: (r["n_a"], r["d_a"], r["n_b"], r["d_b"], r["est"])
        for r in hist_join_estimate_from_stats(sb, sa).collect()
    }
    onthefly_rev = {
        r["bucket"]: (r["n_a"], r["d_a"], r["n_b"], r["d_b"], r["est"])
        for r in hist_join_estimate(b, "kb", a, "ka", n_buckets=4).collect()
    }
    assert served_rev == onthefly_rev
    assert served_rev[-1][2] == 40

    # inconsistent non-empty artifact still rejected even when the
    # other side is empty
    bad = sa.withColumn(
        "lo", F.when(F.col("bucket") == 0, F.lit(99)).otherwise(F.col("lo"))
    )
    with pytest.raises(ValueError, match="domains differ"):
        hist_join_estimate_from_stats(bad, sb)


def test_analyze_key_stats_far_out_of_domain_key_clamps_not_wraps(spark):
    """A key far outside the declared domain must land in the nearest
    EDGE bucket: the old expression multiplied first, overflowed
    BIGINT (Spark wraps silently), and the wrapped sign landed a huge
    positive key in bucket 0.  The clamp now bounds the product by
    span*n_buckets."""
    from mongo2mysql_spark.operators.histjoin import analyze_key_stats

    df = spark.createDataFrame(
        [(2**62,), (-(2**62),), (50,)], "k long"
    )
    got = {
        r["bucket"]: (r["n"], r["d"])
        for r in analyze_key_stats(df, "k", n_buckets=8, lo=0, hi=99).collect()
    }
    assert got[7] == (1, 1)  # 2^62 clamps to the top edge bucket
    assert got[0] == (1, 1)  # -2^62 clamps to bucket 0
    assert got[4] == (1, 1)  # in-domain key unchanged: 50*8 DIV 100 = 4


# ----------------------------------------------- star subset label collision


def test_star_plan_rejects_non_contiguous_label_collision(spark):
    """Star subsets are arbitrary dim subsets: dims ['a','zz','b','ab']
    collide ({a,b} and {ab} both label 'fab') even though every
    contiguous interval is unambiguous — both the Spark planner and
    the SQL generator must reject the fixture up front instead of
    emitting duplicate subset keys / duplicate CTE names."""
    from mongo2mysql_spark.operators.joinorder import (
        star_join_plan,
        star_join_plan_sql,
    )

    with pytest.raises(ValueError, match="subset labels collide"):
        star_join_plan_sql(
            ("fact", "f"),
            [("ta", "a", "k", "k"), ("tzz", "zz", "k", "k"),
             ("tb", "b", "k", "k"), ("tab", "ab", "k", "k")],
        )
    one = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="subset labels collide"):
        star_join_plan(
            spark, ("f", one),
            [("a", one, "k", "k"), ("zz", one, "k", "k"),
             ("b", one, "k", "k"), ("ab", one, "k", "k")],
        )
    # interval-unambiguous chain names stay accepted by the chain check
    from mongo2mysql_spark.operators.joinorder import _check_labels

    _check_labels(["a", "zz", "b", "ab"])


def test_attr_ctes_share_funnel_window_constant():
    """The attribution oracle CTEs interpolate FUNNEL_WINDOW_MS (the
    same constant the Spark branch passes) — a hardcoded ms literal
    would silently desync the restatement if the window changed."""
    from mongo2mysql_spark.queries.behavior import (
        _ATTR_CTES,
        FUNNEL_WINDOW_MS,
    )

    assert f"<= {FUNNEL_WINDOW_MS})" in _ATTR_CTES

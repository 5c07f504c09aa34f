"""KMV / theta sketches (operators/kmv): unsaturated exactness,
mergeability, estimate accuracy, set-operation estimates.  Cross-engine
estimate hashing is pinned by test_oracle (agg_approx_sketches 'kmv')."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo2mysql_spark.operators.kmv import (
    kmv_intersect_est,
    kmv_join_size_est,
    kmv_sketch,
    kmv_stats,
    kmv_tuple_sketch,
    kmv_union,
)

K = 128


def _ids(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("v"))


def test_unsaturated_sketch_is_exact(spark):
    sk = kmv_sketch(_ids(spark, 0, 50), "v", K)
    st = kmv_stats(sk, K).collect()[0]
    assert st.cnt == 50 and st.est == 50.0


def test_duplicates_collapse(spark):
    df = _ids(spark, 0, 50).unionByName(_ids(spark, 0, 50))
    st = kmv_stats(kmv_sketch(df, "v", K), K).collect()[0]
    assert st.cnt == 50 and st.est == 50.0


def test_mergeable_union_equals_direct_sketch(spark):
    a, b = _ids(spark, 0, 5000), _ids(spark, 3000, 9000)
    direct = [
        r.h for r in kmv_sketch(_ids(spark, 0, 9000), "v", K).orderBy("h").collect()
    ]
    merged = [
        r.h
        for r in kmv_union(
            kmv_sketch(a, "v", K), kmv_sketch(b, "v", K), K
        ).orderBy("h").collect()
    ]
    assert merged == direct  # sketch-level equality, not just estimates


def test_estimate_accuracy_saturated(spark):
    n = 20_000
    st = kmv_stats(kmv_sketch(_ids(spark, 0, n), "v", K), K).collect()[0]
    assert st.cnt == K
    assert abs(st.est - n) / n < 3.0 / (K - 2) ** 0.5  # ~3 RSE


def test_intersection_estimate(spark):
    a, b = _ids(spark, 0, 8000), _ids(spark, 4000, 12000)  # overlap 4000
    est = kmv_intersect_est(
        kmv_sketch(a, "v", K), kmv_sketch(b, "v", K)
    ).collect()[0]
    assert abs(est.est - 4000) / 4000 < 0.5  # intersection RSE is wider
    assert est.common > 0 and est.theta > 0


def test_self_intersection_matches_stats_convention(spark):
    """A ∩ A under the exclusive threshold: common = K−1 samples
    strictly below θ, so the intersection estimate equals kmv_stats's
    (K−1)·2^48/θ exactly — the two estimators share one convention.
    (The old ≤-threshold counted θ itself: common = K, est biased up
    by exactly one sample's worth.)"""
    sk = kmv_sketch(_ids(spark, 0, 20_000), "v", K)
    st = kmv_stats(sk, K).collect()[0]
    est = kmv_intersect_est(sk, sk).collect()[0]
    assert st.cnt == K  # saturated, so stats uses the (K−1)/θ branch
    assert est.common == K - 1
    assert est.est == st.est


def test_disjoint_intersection_is_zero(spark):
    a, b = _ids(spark, 0, 3000), _ids(spark, 100_000, 103_000)
    est = kmv_intersect_est(
        kmv_sketch(a, "v", K), kmv_sketch(b, "v", K)
    ).collect()[0]
    assert est.common == 0 and est.est == 0.0


def _keyed(spark, lo, hi, copies):
    """keys lo..hi-1, each repeated `copies` times."""
    return (
        spark.range(lo, hi)
        .select(F.col("id").alias("v"))
        .withColumn("__c", F.explode(F.sequence(F.lit(1), F.lit(copies))))
        .drop("__c")
    )


def test_tuple_sketch_carries_counts(spark):
    sk = kmv_tuple_sketch(_keyed(spark, 0, 50, 3), "v", K)
    rows = sk.collect()
    assert len(rows) == 50 and all(r.cnt == 3 for r in rows)


def test_join_size_estimate_accuracy(spark):
    # A: keys 0..7999 x2 rows; B: keys 4000..11999 x3 rows
    # true join size = 4000 overlapping keys x 2 x 3 = 24000
    a = kmv_tuple_sketch(_keyed(spark, 0, 8000, 2), "v", K)
    b = kmv_tuple_sketch(_keyed(spark, 4000, 12000, 3), "v", K)
    est = kmv_join_size_est(a, b).collect()[0]
    assert est.common > 0
    assert abs(est.est - 24000) / 24000 < 0.5  # sampled-overlap RSE band


def test_join_size_exact_under_unsaturated_sketches(spark):
    # both sketches unsaturated -> every key sampled BUT the estimate
    # still divides by theta (the max sampled hash), so assert the
    # sum_products side exactly: all 30 common keys present, 2*5=10 each
    a = kmv_tuple_sketch(_keyed(spark, 0, 30, 2), "v", K)
    b = kmv_tuple_sketch(_keyed(spark, 0, 30, 5), "v", K)
    est = kmv_join_size_est(a, b).collect()[0]
    # exclusive threshold drops exactly the theta key itself
    assert est.common == 29
    assert est.sum_products == 29 * 10


def test_join_size_disjoint_is_zero(spark):
    a = kmv_tuple_sketch(_keyed(spark, 0, 3000, 2), "v", K)
    b = kmv_tuple_sketch(_keyed(spark, 50_000, 53_000, 2), "v", K)
    est = kmv_join_size_est(a, b).collect()[0]
    assert est.common == 0 and est.sum_products == 0 and est.est == 0.0

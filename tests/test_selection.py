"""Exact distributed quantile selection (operators/selection):
bit-equality with Spark's percentile aggregate, edge quantiles,
null handling, bucket-granularity invariance."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mongo2mysql_spark.operators.selection import exact_quantiles


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v double")


def test_bit_equal_to_percentile_random(spark):
    random.seed(13)
    vals = [random.uniform(-5e4, 1e6) for _ in range(4097)]
    df = _df(spark, vals)
    want = df.agg(
        F.percentile("v", 0.5).alias("p50"),
        F.percentile("v", 0.9).alias("p90"),
        F.percentile("v", 0.131).alias("p131"),
    ).collect()[0]
    got = exact_quantiles(
        df, "v", {"p50": 0.5, "p90": 0.9, "p131": 0.131}
    ).collect()[0]
    assert (got.p50, got.p90, got.p131) == (want.p50, want.p90, want.p131)


def test_duplicates_and_negative_buckets(spark):
    vals = [-3.5] * 10 + [-3.2] * 5 + [0.0] * 7 + [2.25] * 4
    df = _df(spark, vals)
    for q in (0.0, 0.25, 0.5, 0.77, 1.0):
        want = df.agg(F.percentile("v", q)).collect()[0][0]
        got = exact_quantiles(df, "v", {"x": q}).collect()[0].x
        assert got == want, q


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (2.0,), (None,), (3.0,)], "v double"
    )
    got = exact_quantiles(df, "v", {"med": 0.5}).collect()[0].med
    assert got == 2.0


def test_bucket_granularity_invariant(spark):
    random.seed(29)
    vals = [random.uniform(0, 100) for _ in range(500)]
    df = _df(spark, vals)
    coarse = exact_quantiles(
        df, "v", {"p": 0.63}, bucket_expr="FLOOR({c} / 25)"
    ).collect()[0].p
    fine = exact_quantiles(
        df, "v", {"p": 0.63}, bucket_expr="FLOOR({c} * 100)"
    ).collect()[0].p
    default = exact_quantiles(df, "v", {"p": 0.63}).collect()[0].p
    assert coarse == fine == default


def test_empty_and_validation(spark):
    df = spark.createDataFrame([], "v double")
    assert exact_quantiles(df, "v", {"p": 0.5}).collect()[0].p is None
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", {})
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", {"p": 1.5})

"""UniMax waterfill tests (operators/unimax.py); cross-engine parity is
covered by the sample_split_stratified 'unimax' oracle branch."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from mongo2mysql_spark.operators.unimax import unimax_mixture, unimax_waterfill


def test_waterfill_respects_caps_and_budget():
    sizes = [("big", 1000), ("small", 10), ("mid", 100)]
    out = unimax_waterfill(sizes, budget=500, e_max=2)
    # smallest-first order
    assert [r[0] for r in out] == ["small", "mid", "big"]
    by = {r[0]: r for r in out}
    # small domain hits its epoch cap (2*10=20 < quota 500//3=166)
    assert by["small"][2] == 20 and by["small"][3] == 2000
    # mid: quota (500-20)//2 = 240 > 200 -> capped at 200 (2 epochs)
    assert by["mid"][2] == 200 and by["mid"][3] == 2000
    # big absorbs the remainder: 500-20-200 = 280, under its cap
    assert by["big"][2] == 280
    assert by["big"][3] == (1000 * 280) // 1000
    assert sum(r[2] for r in out) <= 500
    assert all(r[2] <= 2 * r[1] for r in out)


def test_waterfill_budget_exceeds_caps():
    # budget larger than 2 epochs of everything: every domain capped
    sizes = [("a", 5), ("b", 7)]
    out = unimax_waterfill(sizes, budget=1000, e_max=2)
    assert {(r[0], r[2]) for r in out} == {("a", 10), ("b", 14)}
    assert all(r[3] == 2000 for r in out)


def test_waterfill_zero_size_domain():
    out = unimax_waterfill([("empty", 0), ("x", 10)], budget=10, e_max=2)
    by = {r[0]: r for r in out}
    assert by["empty"][2] == 0 and by["empty"][3] == 0


def test_unimax_mixture_on_frame(spark):
    df = spark.createDataFrame(
        [("s0", "a b c"), ("s0", "d e"), ("s1", "f")], ["source", "text"]
    )
    rows = {
        r["source"]: r
        for r in unimax_mixture(
            df,
            "source",
            F.size(F.split(F.col("text"), " ")).cast("long"),
            budget_frac=Fraction(1, 2),
            e_max=2,
        ).collect()
    }
    assert rows["s0"].n_tokens == 5 and rows["s1"].n_tokens == 1
    # budget = 6//2 = 3; s1 first: min(2*1, 3//2=1) = 1; s0: min(10, 2//1) = 2
    assert rows["s1"].alloc_tokens == 1 and rows["s0"].alloc_tokens == 2
    assert rows["s1"].epochs_milli == 1000 and rows["s0"].epochs_milli == 400

"""Dice collocations (operators/collocations): planted multiword
expression, count semantics, threshold boundary, 1-based indexing
parity, and the DuckDB restatement equality on a random corpus."""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

from mongo2mysql_spark.operators.collocations import (
    dice_collocations,
    dice_collocations_sql,
)


def _coll(spark, texts, **kw):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return dice_collocations(df, F.split(F.col("text"), " "), **kw)


def test_planted_collocation_dominates(spark):
    # "new"/"york" occur ONLY as the adjacent pair → dice exactly 1;
    # the filler words co-occur but dilute (cat,cat: 2·20/(30+30)<1)
    texts = ["new york " + "cat " * 3 + "dog" for _ in range(10)]
    got = {
        (r.w1, r.w2): r
        for r in _coll(
            spark, texts, min_pair=5, min_dice_num=1, min_dice_den=1
        ).collect()
    }
    assert set(got) == {("new", "york")}
    r = got[("new", "york")]
    assert r.n_xy == 10 and r.n_x == 10 and r.n_y == 10
    assert r.dice == 1.0


def test_counts_are_occurrences_not_docs(spark):
    texts = ["a b a b", "a b"]  # bigram (a,b) occurs 3x, (b,a) 1x
    got = {
        (r.w1, r.w2): r
        for r in _coll(
            spark, texts, min_pair=1, min_dice_num=0, min_dice_den=1
        ).collect()
    }
    assert got[("a", "b")].n_xy == 3
    assert got[("b", "a")].n_xy == 1
    # unigram counts are token occurrences: a appears 3x, b 3x
    assert got[("a", "b")].n_x == 3 and got[("a", "b")].n_y == 3
    assert got[("a", "b")].dice == 1.0  # 2*3/(3+3)


def test_dice_threshold_boundary_is_inclusive(spark):
    # (a,b): n_xy=2, n_x=4, n_y=4 → dice = 4/8 = 1/2 exactly; every
    # other bigram occurs once (below min_pair)
    texts = ["a b", "a b", "a z", "z b", "a y", "y b"]
    got = {
        (r.w1, r.w2): r.dice
        for r in _coll(
            spark, texts, min_pair=2, min_dice_num=1, min_dice_den=2
        ).collect()
    }
    assert got == {("a", "b"): 0.5}
    # one notch above the exact boundary excludes it
    assert (
        _coll(
            spark, texts, min_pair=2, min_dice_num=51, min_dice_den=100
        ).collect()
        == []
    )


def test_single_token_docs_yield_no_bigrams(spark):
    got = _coll(
        spark, ["a", "b", "a"], min_pair=1, min_dice_num=0, min_dice_den=1
    ).collect()
    assert got == []


def test_restatement_equality_random_corpus(spark, tmp_path):
    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(25)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 60)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    pq = str(tmp_path / "docs.parquet")
    df.write.mode("overwrite").parquet(pq)
    got = sorted(
        (r.w1, r.w2, r.n_xy, r.n_x, r.n_y, r.dice)
        for r in _coll(
            spark, texts, min_pair=3, min_dice_num=1, min_dice_den=100
        ).collect()
    )
    duck = duckdb.connect()
    duck.execute(
        f"CREATE VIEW docs AS SELECT * FROM parquet_scan('{pq}/*.parquet')"
    )
    sql = (
        "WITH "
        + dice_collocations_sql("docs", "string_split(text, ' ')", 3, 1, 100)
        + " SELECT w1, w2, n_xy, n_x, n_y, dice FROM colloc ORDER BY w1, w2"
    )
    want = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert got == want and len(got) > 10

"""Market-basket association rules (operators/basket): hand-checked
support/confidence/lift, within-basket dedup, Apriori prune, and the
DuckDB restatement equality on random baskets."""

from __future__ import annotations

import random

import duckdb

from mongo2mysql_spark.operators.basket import (
    association_rules,
    association_rules_sql,
)

SCHEMA = "b long, i long"


def _rules(spark, rows, **kw):
    return association_rules(
        spark.createDataFrame(rows, SCHEMA), "b", "i", **kw
    )


def test_hand_checked_counts_and_ratios(spark):
    # 6 baskets; item 1 in 5 of them, item 2 in 4, together in 3
    rows = []
    for b in range(5):
        rows.append((b, 1))
    for b in [0, 1, 2, 5]:
        rows.append((b, 2))
    got = _rules(spark, rows, min_item_count=2, min_pair_count=2).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.item_a, r.item_b) == (1, 2)
    assert (r.n_a, r.n_b, r.n_ab, r.n_baskets) == (5, 4, 3, 6)
    assert r.conf_a2b == 3 / 5
    assert r.conf_b2a == 3 / 4
    assert r.lift == (3 * 6) / (5 * 4)


def test_duplicate_item_in_basket_counts_once(spark):
    rows = [(0, 1), (0, 1), (0, 2), (1, 1), (1, 2), (1, 2)]
    r = _rules(spark, rows, min_item_count=1, min_pair_count=1).collect()[0]
    assert (r.n_a, r.n_b, r.n_ab, r.n_baskets) == (2, 2, 2, 2)


def test_apriori_prune_drops_infrequent_items(spark):
    # item 9 appears once — below min_item_count, so NO rule may touch
    # it even though it co-occurs with item 1
    rows = [(0, 1), (0, 9), (1, 1), (1, 2), (2, 1), (2, 2)]
    got = _rules(spark, rows, min_item_count=2, min_pair_count=1).collect()
    assert {(r.item_a, r.item_b) for r in got} == {(1, 2)}


def test_canonical_order_and_pair_threshold(spark):
    rows = [(0, 5), (0, 3), (1, 5), (1, 3), (2, 5), (2, 4)]
    got = _rules(spark, rows, min_item_count=1, min_pair_count=2).collect()
    assert {(r.item_a, r.item_b) for r in got} == {(3, 5)}  # a < b, (4,5) once


def test_restatement_equality_random_baskets(spark, tmp_path):
    rng = random.Random(23)
    rows = []
    for b in range(300):
        for i in rng.sample(range(40), rng.randrange(1, 8)):
            rows.append((b, i))
    df = spark.createDataFrame(rows, SCHEMA)
    pq = str(tmp_path / "bk.parquet")
    df.write.mode("overwrite").parquet(pq)
    got = sorted(
        (
            (r.item_a, r.item_b, r.n_a, r.n_b, r.n_ab, r.n_baskets,
             r.conf_a2b, r.conf_b2a, r.lift)
            for r in _rules(
                spark, rows, min_item_count=5, min_pair_count=2
            ).collect()
        )
    )
    duck = duckdb.connect()
    duck.execute(
        f"CREATE VIEW bk AS SELECT * FROM parquet_scan('{pq}/*.parquet')"
    )
    sql = (
        "WITH "
        + association_rules_sql("bk", "b", "i", 5, 2)
        + """ SELECT item_a, item_b, n_a, n_b, n_ab, n_baskets,
                     conf_a2b, conf_b2a, lift
              FROM brules ORDER BY item_a, item_b"""
    )
    want = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert got == want and len(got) > 5

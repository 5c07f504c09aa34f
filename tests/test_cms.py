"""Count-min sketch (operators/cms): one-sided error, cell-additive
merge, engine-portable bucket arithmetic vs the DuckDB restatement."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from mongo2mysql_spark.operators.cms import (
    CMS_P,
    cms_build,
    cms_estimate,
    cms_merge,
    cms_sql,
)


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k long")


def _zipf_keys(n=4000, n_keys=60, seed=7):
    random.seed(seed)
    # Zipf-ish: key i with weight 1/(i+1)
    weights = [1.0 / (i + 1) for i in range(n_keys)]
    return random.choices(range(100, 100 + n_keys), weights=weights, k=n)


def test_cms_never_underestimates_and_bounds_overshoot(spark):
    keys = _zipf_keys()
    df = _keys_df(spark, keys)
    true = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    grid = cms_build(df, "k", depth=4, width=64)
    qry = _keys_df(spark, sorted(true))
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(grid, qry, "k", depth=4, width=64).collect()
    }
    assert set(est) == set(true)
    n = len(keys)
    for k, t in true.items():
        assert est[k] >= t  # one-sided: never under
        # loose deterministic sanity bound: overshoot < N (vacuous-safe)
        # plus the probabilistic e/w bound holds on this fixture
        assert est[k] - t <= (2.72 / 64) * n * 4


def test_cms_exact_when_wide(spark):
    """Width >> distinct keys: no collisions, estimates are exact."""
    keys = _zipf_keys(n=1000, n_keys=20)
    df = _keys_df(spark, keys)
    true = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    grid = cms_build(df, "k", depth=4, width=4096)
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(
            grid, _keys_df(spark, sorted(true)), "k", depth=4, width=4096
        ).collect()
    }
    assert est == true


def test_cms_merge_is_cellwise_exact(spark):
    """Sketch(A) + Sketch(B) == Sketch(A ∪ B), integer-exactly — the
    partial-aggregate property (per-partition / per-micro-batch
    sketches fold to the whole-input sketch)."""
    keys = _zipf_keys(n=3000)
    half = len(keys) // 2
    a, b = keys[:half], keys[half:]
    g_all = cms_build(_keys_df(spark, keys), "k", depth=3, width=32)
    g_merged = cms_merge(
        cms_build(_keys_df(spark, a), "k", depth=3, width=32),
        cms_build(_keys_df(spark, b), "k", depth=3, width=32),
    )
    cells_all = {(r["i"], r["bucket"]): r["cnt"] for r in g_all.collect()}
    cells_m = {(r["i"], r["bucket"]): r["cnt"] for r in g_merged.collect()}
    assert cells_all == cells_m and len(cells_all) > 0


def test_cms_matches_duckdb_restatement(spark, tmp_path):
    """Every estimate is the identical BIGINT on both engines — the
    Carter–Wegman arithmetic is the contract."""
    keys = _zipf_keys(n=2500, n_keys=80, seed=13)
    df = _keys_df(spark, keys)
    p = str(tmp_path / "keys.parquet")
    df.coalesce(1).write.parquet(p)
    grid = cms_build(df, "k", depth=4, width=128)
    qry = df.select("k").distinct()
    spark_est = {
        r["k"]: r["est"]
        for r in cms_estimate(grid, qry, "k", depth=4, width=128).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW src AS SELECT k FROM read_parquet('{p}/*.parquet')"
    )
    sql = cms_sql("src", "k", depth=4, width=128)
    duck_est = dict(
        con.execute(f"WITH {sql} SELECT key_val, est FROM cmsest").fetchall()
    )
    assert spark_est == duck_est


def test_cms_validation():
    with pytest.raises(ValueError):
        cms_sql("t", "k", depth=0)
    with pytest.raises(ValueError):
        cms_sql("t", "k", depth=5)
    with pytest.raises(ValueError):
        cms_sql("t", "k", width=1)
    assert CMS_P == 2**31 - 1


def test_cms_store_folds_equal_oneshot_and_guard_replays(spark, tmp_path):
    """Batches folded through the store == the one-shot grid,
    integer-exactly; a replayed (writer, epoch) is a no-op; distinct
    writers guard independently (per-writer epoch map)."""
    from mongo2mysql_spark.streaming.cmsstore import (
        read_cms_store,
        refresh_cms_store,
    )

    keys = _zipf_keys(n=2000, seed=3)
    store = str(tmp_path / "cms")
    import os

    os.makedirs(store)
    thirds = [keys[0::3], keys[1::3], keys[2::3]]
    for i, part in enumerate(thirds):
        assert refresh_cms_store(
            _keys_df(spark, part), store, "k",
            depth=3, width=64, writer=f"w{i}", epoch=0,
        )
    # replay every writer's epoch 0: all no-ops
    for i, part in enumerate(thirds):
        assert not refresh_cms_store(
            _keys_df(spark, part), store, "k",
            depth=3, width=64, writer=f"w{i}", epoch=0,
        )
    folded = {
        (r["i"], r["bucket"]): r["cnt"]
        for r in read_cms_store(spark, store).collect()
    }
    oneshot = {
        (r["i"], r["bucket"]): r["cnt"]
        for r in cms_build(_keys_df(spark, keys), "k",
                           depth=3, width=64).collect()
    }
    assert folded == oneshot and len(folded) > 0


def test_cms_fold_key_matches_duckdb_and_feeds_sketch(spark, tmp_path):
    """The string fold is the identical BIGINT on both engines
    (unicode, empty, prefix-collision cases), lands inside the
    cms_bucket key domain, and string-keyed estimates through it are
    engine-identical."""
    from mongo2mysql_spark.operators.cms import (
        CMS_KEY_MAX,
        cms_fold_key,
        cms_fold_key_sql,
    )

    vals = ["", "a", "ab", "ba", "purchase", "page_view", "café",
            "日本語のテキスト", "x" * 40, "x" * 39 + "y",
            "0123456789abcdef" + "tail1", "0123456789abcdef" + "tail2"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    p = str(tmp_path / "folds.parquet")
    df.coalesce(1).write.parquet(p)
    got = {
        r["s"]: r["f"]
        for r in df.select("s", cms_fold_key(F.col("s")).alias("f")).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW src AS SELECT s FROM read_parquet('{p}/*.parquet')"
    )
    want = dict(
        con.execute(
            f"SELECT s, {cms_fold_key_sql('s')} FROM src"
        ).fetchall()
    )
    assert got == want
    assert all(0 <= f <= CMS_KEY_MAX for f in got.values())
    # same-16-char-prefix strings with the same length DO collide (the
    # documented prefix contract); differing lengths do not
    assert got["0123456789abcdef" + "tail1"] == got["0123456789abcdef" + "tail2"]
    assert got["x" * 40] != got["a"]
    # end-to-end: string-keyed build+estimate is engine-identical
    folded = df.select(cms_fold_key(F.col("s")).alias("k"))
    grid = cms_build(folded, "k", depth=3, width=64)
    est = {
        r["s"]: r["est"]
        for r in cms_estimate(
            grid,
            df.select("s", cms_fold_key(F.col("s")).alias("k")),
            "k", depth=3, width=64,
        ).collect()
    }
    sql = cms_sql("src", cms_fold_key_sql("s"), depth=3, width=64)
    duck_est = dict(
        con.execute(
            f"WITH {sql} SELECT s, est FROM src "
            f"JOIN cmsest ON key_val = {cms_fold_key_sql('s')}"
        ).fetchall()
    )
    assert est == duck_est

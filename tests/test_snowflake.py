"""Snowflake join-order DP (operators/joinorder.snowflake_join_plan):
the composition of the chain and star DPs over arms-with-sub-dimensions
(DPccp specialized to snowflake connectivity).  Pins the singleton-arm
degeneracy to the star DP (bit-exact), DuckDB parity of the full
lattice on a planted-selectivity snowflake, and label-collision
rejection."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.oracle_utils import compare


def _duck_view(con, name: str, path: str) -> None:
    con.execute(
        f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )


def test_snowflake_singleton_arms_degenerates_to_star(spark):
    """With every arm a single table the snowflake DP must emit
    EXACTLY the star DP's rows (no internal rows, no proper prefixes,
    same floors): the composition invariant — c_int = 0 and the
    x10^6-scaled path recurrence collapses to the raw fact-edge
    est6."""
    from mongo2mysql_spark.operators.joinorder import (
        snowflake_join_plan,
        star_join_plan,
    )

    fact = spark.createDataFrame(
        [(1 + i % 7, 1 + i % 3, 1 + i % 5) for i in range(60)],
        "fk1 long, fk2 long, fk3 long",
    )
    d1 = spark.createDataFrame([(k,) for k in range(1, 8)], "a1 long")
    d2 = spark.createDataFrame([(k,) for k in range(1, 3)], "a2 long")
    d3 = spark.createDataFrame([(k, k) for k in range(1, 11)],
                               "a3 long, x3 long")
    star = star_join_plan(
        spark, ("f", fact),
        [("a", d1, "fk1", "a1"), ("b", d2, "fk2", "a2"),
         ("c", d3, "fk3", "a3")],
        n_buckets=4,
    )
    snow = snowflake_join_plan(
        spark, ("f", fact),
        [[("a", d1, "fk1", "a1")], [("b", d2, "fk2", "a2")],
         [("c", d3, "fk3", "a3")]],
        n_buckets=4,
    )
    assert sorted(map(tuple, snow.collect())) == sorted(
        map(tuple, star.collect())
    )


def test_snowflake_matches_duckdb_on_planted_selectivity(spark, tmp_path):
    """Full-lattice parity on a planted snowflake: fact f with a
    two-table arm o←c (selective far end) and single-table arms p and
    s — every internal interval, fact-rooted prefix, and arm-subset
    row (estimate, C_out cost incl. internal, chosen peel) must hash
    engine-identical."""
    from mongo2mysql_spark.operators.joinorder import (
        snowflake_join_plan,
        snowflake_join_plan_sql,
    )

    fact_rows = [
        (1 + i % 50, 1 + i % 20, 1 + i % 8) for i in range(400)
    ]
    o_rows = [(k, 1 + k % 10) for k in range(1, 51)]
    c_rows = [(k,) for k in range(1, 4)]  # selective sub-dimension
    p_rows = [(k,) for k in range(1, 21)]
    s_rows = [(k,) for k in range(1, 9)]
    frames = {
        "sf_fact": spark.createDataFrame(
            fact_rows, "fo long, fp long, fs long"
        ),
        "sf_o": spark.createDataFrame(o_rows, "ok long, ock long"),
        "sf_c": spark.createDataFrame(c_rows, "ck long"),
        "sf_p": spark.createDataFrame(p_rows, "pk long"),
        "sf_s": spark.createDataFrame(s_rows, "sk long"),
    }
    con = duckdb.connect()
    for name, df in frames.items():
        path = str(tmp_path / name)
        df.write.parquet(path)
        _duck_view(con, name, path)

    chains_py = [
        [("o", frames["sf_o"], "fo", "ok"),
         ("c", frames["sf_c"], "ock", "ck")],
        [("p", frames["sf_p"], "fp", "pk")],
        [("s", frames["sf_s"], "fs", "sk")],
    ]
    got = snowflake_join_plan(
        spark, ("f", frames["sf_fact"]), chains_py, n_buckets=4
    )
    # labels sanity: internal 'oc', prefixes 'fo', arm subsets
    subsets = {r["subset"] for r in got.collect()}
    assert {"oc", "fo", "foc", "fp", "fs", "focps"} <= subsets

    sql = snowflake_join_plan_sql(
        ("sf_fact", "f"),
        [[("sf_o", "o", "fo", "ok"), ("sf_c", "c", "ock", "ck")],
         [("sf_p", "p", "fp", "pk")],
         [("sf_s", "s", "fs", "sk")]],
        n_buckets=4,
    )
    assert not compare(got, con, f"WITH {sql} SELECT * FROM snplan")


def test_snowflake_rejects_colliding_labels(spark):
    from mongo2mysql_spark.operators.joinorder import (
        snowflake_join_plan_sql,
    )

    # arm subsets {a,b} and {ab} both label 'fab'
    with pytest.raises(ValueError, match="labels collide"):
        snowflake_join_plan_sql(
            ("tf", "f"),
            [[("ta", "a", "k", "k")], [("tb", "b", "k", "k")],
             [("tab", "ab", "k", "k")]],
        )
    # internal interval labels colliding ACROSS arms: ['a','bc'] and
    # ['ab','c'] both produce the internal label 'abc'
    with pytest.raises(ValueError, match="labels collide"):
        snowflake_join_plan_sql(
            ("tf", "f"),
            [[("ta", "a", "k", "k"), ("tbc", "bc", "k", "k")],
             [("tab", "ab", "k", "k"), ("tc", "c", "k", "k")]],
        )

"""General-graph join-order DP (operators/joinorder.graph_join_plan):
DPsub enumeration of DPccp's csg-cmp pairs over arbitrary connected
query graphs, cycles included.  Pins the bit-exact degeneracies to the
chain DP (est, cost, AND splits) and the star DP (est, cost), DuckDB
parity of the full connected-subset lattice on a planted CYCLIC
q5-shaped graph, the executor applying the cycle-closing edge as a
join conjunction, and input validation."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.oracle_utils import compare
from tests.test_joinexec import _logical_join_tree, _no_auto_broadcast


def test_graph_dp_degenerates_to_chain_bit_exact():
    """On a path graph the general DP must reproduce chain_plan_dp
    exactly — est and cost on every interval, and the chosen split
    (smallest-S1-mask generalizes smallest-cut)."""
    from mongo2mysql_spark.operators.joinorder import (
        chain_plan_dp,
        graph_plan_dp,
    )

    rng = random.Random(7)
    for _ in range(100):
        k = rng.randint(2, 6)
        rows = [rng.randint(0, 5000) for _ in range(k)]
        est6 = [rng.randint(0, 10**10) for _ in range(k - 1)]
        ce, cc, cs = chain_plan_dp(rows, est6)
        ge, gc, gs = graph_plan_dp(
            rows, [(i, i + 1) for i in range(k - 1)], est6
        )
        for (i, j), v in ce.items():
            mask = ((1 << (j - i + 1)) - 1) << i
            assert ge[mask] == v
        for (i, j), v in cc.items():
            mask = ((1 << (j - i + 1)) - 1) << i
            assert gc[mask] == v
            if i != j:
                cut = cs[(i, j)]
                assert gs[mask] == ((1 << (cut - i + 1)) - 1) << i


def test_graph_dp_degenerates_to_star_bit_exact():
    """On a star graph (fact = vertex 0) est and cost must match
    star_plan_dp bit for bit; the peel choice agrees whenever the
    optimum is unique (tie order differs by construction)."""
    from mongo2mysql_spark.operators.joinorder import (
        graph_plan_dp,
        star_plan_dp,
    )

    rng = random.Random(11)
    for _ in range(100):
        kd = rng.randint(1, 5)
        rf = rng.randint(0, 5000)
        rows = [rf] + [rng.randint(0, 3000) for _ in range(kd)]
        est6 = [rng.randint(0, 10**10) for _ in range(kd)]
        se, sc, _sp = star_plan_dp(rf, est6)
        ge, gc, _gs = graph_plan_dp(
            rows, [(0, d + 1) for d in range(kd)], est6
        )
        for s, v in se.items():
            if s == ():
                continue
            mask = 1 | sum(1 << (d + 1) for d in s)
            assert ge[mask] == v
            assert gc[mask] == sc[s]


def _write_cyclic_fixture(spark, tmp_path):
    """A mini q5 topology — c-o-l-s-n-c CYCLE plus the n-r tail.
    Customer nations and supplier nations deliberately disagree on
    part of the data so the cycle edge genuinely filters."""
    specs = {
        "gq_c": ([(k, 1 + k % 4) for k in range(1, 21)],
                 "ck long, cnk long"),
        "gq_o": ([(k, 1 + k % 20) for k in range(1, 61)],
                 "ok long, ock long"),
        "gq_l": ([(1 + i % 60, 1 + i % 8, i) for i in range(200)],
                 "lok long, lsk long, lpx long"),
        "gq_s": ([(k, 1 + (k * 3) % 4) for k in range(1, 9)],
                 "sk long, snk long"),
        "gq_n": ([(k, 1 + k % 2) for k in range(1, 5)],
                 "nk long, nrk long"),
        "gq_r": ([(1,), (2,)], "rk long"),
    }
    frames, paths = {}, {}
    for name, (rows, schema) in specs.items():
        p = str(tmp_path / name)
        spark.createDataFrame(rows, schema).write.parquet(p)
        frames[name] = spark.read.parquet(p)
        paths[name] = p
    return frames, paths


_EDGES = [
    (0, 1, "ck", "ock"),
    (1, 2, "ok", "lok"),
    (2, 3, "lsk", "sk"),
    (0, 4, "cnk", "nk"),
    (3, 4, "snk", "nk"),
    (4, 5, "nrk", "rk"),
]


def test_graph_plan_matches_duckdb_on_cyclic_fixture(spark, tmp_path):
    """Full connected-subset lattice parity (33 subsets, 27 plan rows,
    81 csg-cmp candidates) on the cyclic fixture — every estimate,
    C_out cost, and chosen split must hash engine-identical."""
    from mongo2mysql_spark.operators.joinorder import (
        graph_join_plan,
        graph_join_plan_sql,
    )

    frames, paths = _write_cyclic_fixture(spark, tmp_path)
    con = duckdb.connect()
    for name, p in paths.items():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM"
            f" read_parquet('{p}/*.parquet')"
        )
    tables = [("c", frames["gq_c"]), ("o", frames["gq_o"]),
              ("l", frames["gq_l"]), ("s", frames["gq_s"]),
              ("n", frames["gq_n"]), ("r", frames["gq_r"])]
    got = graph_join_plan(spark, tables, _EDGES, n_buckets=4)
    rows = got.collect()
    # the cyclic subset {c,o,l,s,n} exists; no disconnected subsets leak
    subsets = {r["subset"] for r in rows}
    assert "colsn" in subsets and "colsnr" in subsets
    assert "cl" not in subsets and "cr" not in subsets
    assert len(rows) == 27

    sql = graph_join_plan_sql(
        [("gq_c", "c"), ("gq_o", "o"), ("gq_l", "l"), ("gq_s", "s"),
         ("gq_n", "n"), ("gq_r", "r")],
        _EDGES,
        n_buckets=4,
    )
    assert not compare(got, con, f"WITH {sql} SELECT * FROM grplan")


def test_execute_graph_plan_cycle_edge_and_structure(spark, tmp_path):
    from mongo2mysql_spark.operators.joinexec import (
        execute_graph_plan,
        graph_plan_tree,
    )
    from mongo2mysql_spark.operators.joinorder import (
        graph_join_stats,
        graph_plan_dp,
    )

    frames, _paths = _write_cyclic_fixture(spark, tmp_path)
    tables = [("c", frames["gq_c"]), ("o", frames["gq_o"]),
              ("l", frames["gq_l"]), ("s", frames["gq_s"]),
              ("n", frames["gq_n"]), ("r", frames["gq_r"])]
    rows, est6 = graph_join_stats(tables, _EDGES, n_buckets=4)
    epairs = [(u, v) for u, v, _ku, _kv in _EDGES]
    est, cost, split = graph_plan_dp(rows, epairs, est6)
    tree = graph_plan_tree([n for n, _ in tables], split)

    # markers must be substring-unique across leaf relation strings
    # (e.g. "ck#" would also match o's "ock#"); "[rk#" pins r's leaf
    # because its relation string starts with that column
    markers = {"c": "cnk#", "o": "ock#", "l": "lpx#", "s": "snk#",
               "n": "nrk#", "r": "[rk#"}
    with _no_auto_broadcast(spark):
        got = execute_graph_plan(tables, _EDGES, est, split)
        # 1. physical structure == the DP's chosen bushy tree
        assert _logical_join_tree(got, markers) == tree
        # 2. answer == the declarative join carrying BOTH nation edges
        naive = (
            frames["gq_c"]
            .join(frames["gq_o"], F.col("ck") == F.col("ock"))
            .join(frames["gq_l"], F.col("ok") == F.col("lok"))
            .join(frames["gq_s"], F.col("lsk") == F.col("sk"))
            .join(
                frames["gq_n"],
                (F.col("cnk") == F.col("nk"))
                & (F.col("snk") == F.col("nk")),
            )
            .join(frames["gq_r"], F.col("nrk") == F.col("rk"))
        )
        cols = sorted(naive.columns)
        assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
            map(tuple, naive.select(*cols).collect())
        )
        # 3. the cycle edge FILTERS: dropping c-n changes the count
        loose = (
            frames["gq_c"]
            .join(frames["gq_o"], F.col("ck") == F.col("ock"))
            .join(frames["gq_l"], F.col("ok") == F.col("lok"))
            .join(frames["gq_s"], F.col("lsk") == F.col("sk"))
            .join(frames["gq_n"], F.col("snk") == F.col("nk"))
            .join(frames["gq_r"], F.col("nrk") == F.col("rk"))
        )
        assert got.count() < loose.count()
        # 4. every estimated side fits → all joins broadcast; and
        #    broadcast_rows=0 removes every estimate-derived hint
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") == 5, plan
        cold = execute_graph_plan(tables, _EDGES, est, split,
                                  broadcast_rows=0)
        cold_plan = cold._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in cold_plan, cold_plan


def test_graph_plan_input_validation(spark):
    from mongo2mysql_spark.operators.joinorder import graph_join_plan_sql

    # disconnected graph rejected
    with pytest.raises(ValueError, match="connected"):
        graph_join_plan_sql(
            [("ta", "a"), ("tb", "b"), ("tc", "c")],
            [(0, 1, "k", "k")],
        )
    # labels: connected subsets {a,b} and {ab} both label 'ab'
    with pytest.raises(ValueError, match="labels collide"):
        graph_join_plan_sql(
            [("ta", "a"), ("tb", "b"), ("tab", "ab")],
            [(0, 1, "k", "k"), (1, 2, "k", "k")],
        )
    # malformed edge orientation rejected
    with pytest.raises(ValueError, match="u < v"):
        graph_join_plan_sql(
            [("ta", "a"), ("tb", "b")], [(1, 0, "k", "k")]
        )

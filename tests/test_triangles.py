"""Triangle counting (operators/triangles): planted structures,
brute-force equality on a random graph, orientation exactness (each
triangle once), isolated-node handling."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from mongo2mysql_spark.operators.triangles import node_triangle_stats


def _frames(spark, n_nodes, edges):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "doc_id long")
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_1 long, id_2 long"
    )
    return nodes, pairs


def _stats(spark, n_nodes, edges):
    nodes, pairs = _frames(spark, n_nodes, edges)
    return {
        r.node: (r.degree, r.tri_count, r.clust_coeff)
        for r in node_triangle_stats(nodes, pairs, "doc_id").collect()
    }


def test_clique_chain_star(spark):
    # nodes 0-3: 4-clique; 4-6: chain; 7-10: star centered at 7; 11: isolated
    clique = list(itertools.combinations(range(4), 2))
    chain = [(4, 5), (5, 6)]
    star = [(7, 8), (7, 9), (7, 10)]
    got = _stats(spark, 12, clique + chain + star)
    for i in range(4):  # every clique node: deg 3, 3 triangles, coeff 1
        assert got[i] == (3, 3, 1.0)
    assert got[5] == (2, 0, 0.0)       # chain center: deg 2, no closure
    assert got[4][1] == 0 and got[6][1] == 0
    assert got[7] == (3, 0, 0.0)       # star center
    assert got[8] == (1, 0, None)      # leaf: deg < 2 -> NULL coeff
    assert got[11] == (0, 0, None)     # isolated


def test_random_graph_matches_bruteforce(spark):
    random.seed(41)
    n = 40
    edges = sorted(
        {
            (a, b)
            for a, b in (
                sorted(random.sample(range(n), 2)) for _ in range(220)
            )
        }
    )
    eset = set(map(tuple, edges))
    tri_per_node = {i: 0 for i in range(n)}
    total = 0
    for a, b, c in itertools.combinations(range(n), 3):
        if ((a, b) in eset) and ((b, c) in eset) and ((a, c) in eset):
            total += 1
            for x in (a, b, c):
                tri_per_node[x] += 1
    got = _stats(spark, n, edges)
    assert {k: v[1] for k, v in got.items()} == tri_per_node
    assert sum(v[1] for v in got.values()) == 3 * total


def test_triangle_sql_matches_spark(spark, tmp_path):
    """The DuckDB restatement returns identical rows (the slot's hash
    contract, pinned here on a planted fixture without the driver)."""
    import duckdb

    from mongo2mysql_spark.operators.triangles import triangle_sql

    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (4, 5)]
    nodes, pairs = _frames(spark, 6, edges)
    want = sorted(
        (r.node, r.degree, r.tri_count, r.clust_coeff)
        for r in node_triangle_stats(nodes, pairs, "doc_id").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE nodes AS SELECT * FROM (VALUES " +
                ", ".join(f"({i})" for i in range(6)) + ") t(doc_id)")
    con.execute("CREATE TABLE pairs AS SELECT * FROM (VALUES " +
                ", ".join(f"({a}, {b})" for a, b in edges) + ") t(id_1, id_2)")
    sql = "WITH " + triangle_sql("nodes", "pairs", "doc_id") + \
          " SELECT node, degree, tri_count, clust_coeff FROM tristats"
    got = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want

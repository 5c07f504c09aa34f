"""Graph centrality over document graphs: decimal-exact PageRank.

Training-data pipelines use link/similarity-graph centrality as a
quality prior (Common-Crawl-scale host ranking; duplicate-cluster
centrality: a document similar to many near-dups is the cluster's
backbone, its satellites are the shed copies).  PageRank (Page et al.,
1999) is the canonical such score; here it runs as a fixed number of
power iterations expressed entirely in joins + aggregates.

Exactness contract (same scheme as ``operators/pq.train_codebook_exact``):
message sums accumulate in DECIMAL(30,12) — exact integer arithmetic,
so partial aggregation is ORDER-FREE across any partitioning and every
iteration restates in DuckDB SQL; each per-node contribution is one
IEEE division (rank/out-degree), each update one multiply + add of
engine-portable double literals.  Scaled integers stay below 2^53
(ranks ≤ 1), so the decimal→double conversion is a single
correctly-rounded step in Python, Spark and DuckDB alike.

Scale shape per iteration: one join of edges→ranks on the source key,
one map-side-combined groupBy on the destination key, one left join
back to the node set — three shuffles on graph-sized frames, no
windows, no driver state beyond the node count.  At web scale the
rank frame should be checkpointed every few iterations to cut lineage
(the fixed ``iters`` here is small by design: quality priors use 3-5
iterations, not convergence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(30,12)"


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after ``iters`` power iterations from the uniform
    start.  ``edges`` is the DIRECTED edge list — pass both directions
    for similarity graphs.  Nodes without in-edges settle at the
    teleport mass (1−d)/N; dangling mass is dropped, not redistributed
    (the fixed-iteration quality-prior variant — both engines state the
    same recurrence, which is what the hash verifies)."""
    n = nodes.count()
    if n == 0:
        return nodes.select(
            F.col(id_col).alias("node"), F.lit(0.0).alias("rank")
        )
    teleport = (1.0 - damping) / n
    node_ids = nodes.select(F.col(id_col).alias("node"))
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__deg"))
    ranks = node_ids.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges[src] == ranks["node"])
            .join(deg, src)
            .select(
                F.col(dst).alias("__to"),
                (F.col("rank") / F.col("__deg")).cast(_DEC).alias("__c"),
            )
        )
        sums = contrib.groupBy("__to").agg(F.sum("__c").alias("__s"))
        ranks = (
            node_ids.join(sums, node_ids["node"] == sums["__to"], "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * F.coalesce(
                        F.col("__s").cast("double"), F.lit(0.0)
                    )
                ).alias("rank"),
            )
        )
    return ranks


def pagerank_sql(
    nodes_cte: str,
    edges_cte: str,
    node_col: str,
    iters: int = 3,
    damping: float = 0.85,
    prefix: str = "pr",
) -> str:
    """DuckDB restatement of :func:`pagerank` as a CTE chain (no
    trailing comma; final CTE is ``{prefix}{iters}`` with columns
    (node, rank)).  ``nodes_cte``/``edges_cte`` are the NAMES of
    in-scope CTEs: nodes (one column ``node_col``), edges (src, dst).
    Literals ride as CAST('…' AS DOUBLE) — bare decimals are DECIMAL in
    both engines' SQL — so every float op matches the Spark plan
    op-for-op."""
    d = f"CAST('{damping!r}' AS DOUBLE)"
    one_minus = f"CAST('{1.0 - damping!r}' AS DOUBLE)"
    ncount = f"(SELECT CAST(COUNT(*) AS DOUBLE) FROM {nodes_cte})"
    blocks = [
        f"""{prefix}deg AS (
      SELECT src, COUNT(*) AS deg FROM {edges_cte} GROUP BY src),
    {prefix}0 AS (
      SELECT {node_col} AS node, CAST('1.0' AS DOUBLE) / {ncount} AS rank
      FROM {nodes_cte})"""
    ]
    for t in range(1, iters + 1):
        blocks.append(f"""{prefix}s{t} AS (
      SELECT e.dst AS node,
             SUM(CAST(p.rank / d.deg AS DECIMAL(30,12))) AS s
      FROM {edges_cte} e
      JOIN {prefix}{t - 1} p ON p.node = e.src
      JOIN {prefix}deg d ON d.src = e.src
      GROUP BY e.dst),
    {prefix}{t} AS (
      SELECT n.{node_col} AS node,
             {one_minus} / {ncount}
             + {d} * COALESCE(CAST(s.s AS DOUBLE), CAST('0.0' AS DOUBLE))
               AS rank
      FROM {nodes_cte} n LEFT JOIN {prefix}s{t} s ON s.node = n.{node_col})""")
    return ",\n    ".join(blocks)

"""Synchronous label propagation over the near-duplicate graph
(extension layer — the reference's 556-LoC ETL core has no graph
surface).

The third graph-analytics primitive next to connected components
(WHICH docs form a family) and PageRank (HOW CENTRAL a doc is): LPA
smooths a node ATTRIBUTE over the graph — each round, every node
adopts the majority label among its neighbors' current labels.  In a
curation pipeline this propagates noisy per-document metadata (a
misfired language-ID, a missing source tag, a quality gate decision)
across near-duplicate families: if nine near-copies say ``en`` and one
says ``de``, the odd one out is a detector error, not a German page
(Raghavan et al. 2007, made deterministic).

Determinism (LPA's classic weakness is tie-chaos): synchronous
updates, SELF-INCLUSIVE voting (the node's own current label counts
once — the stabilized variant: without it, a 1-1 neighbor tie in a
2-clique flips BOTH nodes and small cliques oscillate), argmax
resolved max-count-then-LEXICOGRAPHICALLY-SMALLEST label, isolated
nodes keep their seed — every round is a pure function of the
previous labeling, so a fixed iteration count is exactly restatable
as unrolled SQL and hash-gates per node.

Scale shape per round: one edge⋈label join (shuffles on the edge
key), one map-side-combined (node, label) count, a two-phase
max-then-min argmax (no windows), one left join back to keep
isolated nodes.  Rounds are a fixed small constant — the smoothing
use-case wants 1-3 rounds, not convergence (full convergence is the
components operator's job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(
    labels: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    label_col: str = "label",
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 2,
) -> DataFrame:
    """``iters`` synchronous LPA rounds.  ``labels`` = (id, label)
    seeds; ``edges`` = SYMMETRIC (src, dst) pairs.  Returns (id,
    label) after the final round; join back to the seeds for a
    changed-flag."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    cur = labels.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("label")
    )
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    for _ in range(iters):
        votes = (
            e.join(cur.withColumnRenamed("id", "dst"), "dst")
            .select(F.col("src").alias("id"), "label")
            .unionByName(cur)  # self-inclusive: own label votes once
            .groupBy("id", "label")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        mx = votes.groupBy("id").agg(F.max("__c").alias("__mc"))
        win = (
            votes.join(mx, "id")
            .filter(F.col("__c") == F.col("__mc"))
            .groupBy("id")
            .agg(F.min("label").alias("__wl"))
        )
        cur = (
            cur.join(win, "id", "left")
            .select(
                "id", F.coalesce("__wl", "label").alias("label")
            )
            .localCheckpoint(eager=False)
        )
    return cur


def label_propagation_sql(
    labels_cte: str,
    edges_cte: str,
    iters: int = 2,
    prefix: str = "lp",
) -> str:
    """DuckDB restatement as unrolled rounds; ``labels_cte`` must
    expose (id, label), ``edges_cte`` symmetric (src, dst).  Final CTE
    ``<prefix>{iters}(id, label)``."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    x = prefix
    ctes = [f"{x}0 AS (SELECT id, label FROM {labels_cte})"]
    for i in range(1, iters + 1):
        p = f"{x}{i - 1}"
        ctes.append(
            f"""{x}v{i} AS (
      SELECT id, label, count(*) AS c FROM (
        SELECT e.src AS id, l.label
        FROM {edges_cte} e JOIN {p} l ON l.id = e.dst
        UNION ALL
        SELECT id, label FROM {p})
      GROUP BY 1, 2),
    {x}m{i} AS (SELECT id, max(c) AS mc FROM {x}v{i} GROUP BY id),
    {x}w{i} AS (
      SELECT v.id, min(v.label) AS wl
      FROM {x}v{i} v JOIN {x}m{i} m ON m.id = v.id AND v.c = m.mc
      GROUP BY v.id),
    {x}{i} AS (
      SELECT b.id, COALESCE(w.wl, b.label) AS label
      FROM {p} b LEFT JOIN {x}w{i} w USING (id))"""
        )
    return ",\n    ".join(ctes)

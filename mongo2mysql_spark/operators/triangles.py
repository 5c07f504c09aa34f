"""Distributed triangle counting via degree orientation (Suri &
Vassilvitskii, WWW 2011 "Counting triangles and the curse of the last
reducer"; extension layer — the reference's 556-LoC ETL core has no
graph surface).

Triangles on the near-dup pair graph are the structure signal the
closure can't give: a connected component may be a thin chain of
borderline matches or a dense clique of true duplicates — per-node
triangle participation (and the clustering coefficient it induces)
separates the two, which is how dedup pipelines decide whether a
cluster is one document family or several chained together.

The naive wedge join keys wedges on their CENTER, so a hub of degree d
produces d² wedge rows under one key — the "curse of the last reducer".
Degree orientation fixes the shape: direct every edge from its
(degree, id)-smaller endpoint to the larger, so each node's
out-degree is bounded by O(sqrt(m)) and every triangle has exactly ONE
node with two outgoing edges (its (degree, id)-minimum).  Wedges are
generated only at that node and closed by one equi-join against the
oriented edge list — counted exactly once, no distinct needed:

- degrees: one groupBy on the symmetric edge list;
- orientation: a projection (no shuffle beyond the degree join);
- wedges: oriented self-join on src (out-degree-bounded fan-out);
- closure: equi-join wedge (v, w) against oriented edges on BOTH
  endpoints — the wedge pair is emitted in (degree, id) order, which is
  exactly the orientation of the closing edge.

Everything is integer (counts) except the clustering coefficient's one
IEEE division, so per-node results hash bit-identically against a
DuckDB restatement of the same oriented-join chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def node_triangle_stats(
    nodes: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """(node, degree, tri_count, clust_coeff) for every row of
    ``nodes`` — isolated nodes get degree 0 / tri_count 0 / NULL
    coefficient.

    ``pairs`` must be the canonical undirected edge list: columns
    ``id_1 < id_2``, no duplicates (the LSH pair contract).
    ``clust_coeff = 2·tri / (deg·(deg−1))`` for deg ≥ 2, else NULL.
    """
    e = pairs.select(F.col("id_1").alias("a"), F.col("id_2").alias("b"))
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))

    # orient by (deg, id): src = lexicographically smaller endpoint
    da = deg.select(F.col("a").alias("id_1"), F.col("deg").alias("d1"))
    db = deg.select(F.col("a").alias("id_2"), F.col("deg").alias("d2"))
    keyed = pairs.select("id_1", "id_2").join(da, "id_1").join(db, "id_2")
    fwd = F.struct(F.col("d1"), F.col("id_1")) < F.struct(
        F.col("d2"), F.col("id_2")
    )
    oriented = keyed.select(
        F.when(fwd, F.col("id_1")).otherwise(F.col("id_2")).alias("src"),
        F.when(fwd, F.col("id_2")).otherwise(F.col("id_1")).alias("dst"),
        F.when(fwd, F.col("d2")).otherwise(F.col("d1")).alias("ddst"),
    )

    # wedges at the (deg, id)-minimum node, dst pair in (deg, id) order
    o1 = oriented.select(
        "src", F.col("dst").alias("v"), F.col("ddst").alias("dv")
    )
    o2 = oriented.select(
        "src", F.col("dst").alias("w"), F.col("ddst").alias("dw")
    )
    wedges = o1.join(o2, "src").filter(
        F.struct(F.col("dv"), F.col("v")) < F.struct(F.col("dw"), F.col("w"))
    )
    closing = oriented.select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    tris = wedges.join(closing, ["v", "w"]).select(
        F.col("src").alias("u"), "v", "w"
    )

    # per-node participation: each triangle credits its three corners
    corner = (
        tris.select(F.col("u").alias("node"))
        .unionByName(tris.select(F.col("v").alias("node")))
        .unionByName(tris.select(F.col("w").alias("node")))
    )
    tcnt = corner.groupBy("node").agg(F.count(F.lit(1)).alias("tri_count"))

    base = nodes.select(F.col(id_col).alias("node"))
    out = (
        base.join(deg.withColumnRenamed("a", "node"), "node", "left")
        .join(tcnt, "node", "left")
        .select(
            "node",
            F.coalesce("deg", F.lit(0)).cast("long").alias("degree"),
            F.coalesce("tri_count", F.lit(0)).cast("long").alias("tri_count"),
        )
    )
    return out.withColumn(
        "clust_coeff",
        F.when(
            F.col("degree") >= 2,
            (F.lit(2.0) * F.col("tri_count").cast("double"))
            / (
                F.col("degree").cast("double")
                * (F.col("degree") - F.lit(1)).cast("double")
            ),
        ),
    )


def triangle_sql(nodes_cte: str, pairs_cte: str, id_col: str) -> str:
    """DuckDB CTE chain restating :func:`node_triangle_stats` over
    ``pairs_cte`` (columns id_1 < id_2) and ``nodes_cte`` — emits a
    final CTE ``tristats(node, degree, tri_count, clust_coeff)``.
    Identical join/orientation structure, one IEEE division, so every
    row hashes bit-for-bit."""
    return f"""trisym AS (
      SELECT id_1 AS a, id_2 AS b FROM {pairs_cte}
      UNION ALL SELECT id_2, id_1 FROM {pairs_cte}),
    trideg AS (SELECT a, count(*) AS deg FROM trisym GROUP BY a),
    trior AS (
      SELECT CASE WHEN (da.deg, e.id_1) < (db.deg, e.id_2)
                  THEN e.id_1 ELSE e.id_2 END AS src,
             CASE WHEN (da.deg, e.id_1) < (db.deg, e.id_2)
                  THEN e.id_2 ELSE e.id_1 END AS dst,
             CASE WHEN (da.deg, e.id_1) < (db.deg, e.id_2)
                  THEN db.deg ELSE da.deg END AS ddst
      FROM {pairs_cte} e
      JOIN trideg da ON da.a = e.id_1
      JOIN trideg db ON db.a = e.id_2),
    triwedge AS (
      SELECT o1.src AS u, o1.dst AS v, o2.dst AS w
      FROM trior o1 JOIN trior o2 ON o1.src = o2.src
      WHERE (o1.ddst, o1.dst) < (o2.ddst, o2.dst)),
    tritri AS (
      SELECT w.u, w.v, w.w
      FROM triwedge w JOIN trior c ON c.src = w.v AND c.dst = w.w),
    tricorner AS (
      SELECT u AS node FROM tritri
      UNION ALL SELECT v FROM tritri
      UNION ALL SELECT w FROM tritri),
    tricnt AS (SELECT node, count(*) AS tri_count
               FROM tricorner GROUP BY node),
    tristats AS (
      SELECT n.{id_col} AS node,
             CAST(COALESCE(d.deg, 0) AS BIGINT) AS degree,
             CAST(COALESCE(t.tri_count, 0) AS BIGINT) AS tri_count,
             CASE WHEN COALESCE(d.deg, 0) >= 2 THEN
               (2.0 * CAST(COALESCE(t.tri_count, 0) AS DOUBLE))
               / (CAST(d.deg AS DOUBLE) * CAST(d.deg - 1 AS DOUBLE))
             END AS clust_coeff
      FROM {nodes_cte} n
      LEFT JOIN trideg d ON d.a = n.{id_col}
      LEFT JOIN tricnt t ON t.node = n.{id_col})"""

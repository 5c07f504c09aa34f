"""Similarity-search queries (extension layer): brute-force cosine
top-k, IVF-bucketed ANN, and embedding array statistics — all with
exact-decimal cosine oracles (see functions/vector.py for why the
decimal form is engine-portable)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo2mysql_spark.functions.vector import norm_exact
from mongo2mysql_spark.operators.similarity import topk_bruteforce, topk_ivf
from mongo2mysql_spark.queries import register
from mongo2mysql_spark.sources import load_table as T

N_QUERIES = 5
STRIDE = 97

_UNNEST_NORM = """
    ce AS (SELECT vec_id, label,
                  unnest(embedding) AS v,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings),
    norms AS (SELECT vec_id,
                     sqrt(CAST(SUM(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE) AS DECIMAL(30,15))) AS DOUBLE)) AS nrm
              FROM ce GROUP BY vec_id)
"""


@register(
    "ann_topk_bruteforce",
    f"""
    WITH {_UNNEST_NORM},
    qe AS (SELECT * FROM ce WHERE vec_id < {N_QUERIES}),
    dots AS (
      SELECT qe.vec_id AS query_id, ce.vec_id AS neighbor_id,
             CAST(SUM(CAST(CAST(qe.v AS DOUBLE) * CAST(ce.v AS DOUBLE) AS DECIMAL(30,15))) AS DOUBLE) AS dot
      FROM qe JOIN ce ON qe.i = ce.i AND ce.vec_id <> qe.vec_id
      GROUP BY 1, 2),
    scored AS (
      SELECT query_id, neighbor_id,
             ROUND(dot / (nq.nrm * nc.nrm), 6) AS cosine
      FROM dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nc ON nc.vec_id = neighbor_id)
    SELECT query_id, neighbor_id, cosine,
           CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= 10
    """,
    doc="exact cosine top-10 per query vector (broadcast queries, corpus streams).",
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    return topk_bruteforce(e, q, "vec_id", "embedding", k=10).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )


@register(
    "ann_topk_ivf",
    f"""
    WITH {_UNNEST_NORM},
    cent AS (SELECT * FROM ce WHERE vec_id % {STRIDE} = 0),
    assign_dots AS (
      SELECT ce.vec_id, cent.vec_id AS centroid_id,
             CAST(SUM(CAST(CAST(ce.v AS DOUBLE) * CAST(cent.v AS DOUBLE) AS DECIMAL(30,15))) AS DOUBLE) AS dot
      FROM ce JOIN cent ON ce.i = cent.i
      GROUP BY 1, 2),
    assign_scored AS (
      SELECT a.vec_id, a.centroid_id,
             ROUND(a.dot / (nv.nrm * nc.nrm), 6) AS ccos
      FROM assign_dots a
      JOIN norms nv ON nv.vec_id = a.vec_id
      JOIN norms nc ON nc.vec_id = a.centroid_id),
    assigned AS (
      SELECT vec_id, centroid_id
      FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY ccos DESC, centroid_id) AS rn
            FROM assign_scored)
      WHERE rn = 1),
    queries AS (SELECT vec_id AS query_id, centroid_id FROM assigned WHERE vec_id < {N_QUERIES}),
    bucket_pairs AS (
      SELECT q.query_id, a.vec_id AS neighbor_id
      FROM queries q JOIN assigned a ON a.centroid_id = q.centroid_id
      WHERE a.vec_id <> q.query_id),
    pair_dots AS (
      SELECT bp.query_id, bp.neighbor_id,
             CAST(SUM(CAST(CAST(qe.v AS DOUBLE) * CAST(ne.v AS DOUBLE) AS DECIMAL(30,15))) AS DOUBLE) AS dot
      FROM bucket_pairs bp
      JOIN ce qe ON qe.vec_id = bp.query_id
      JOIN ce ne ON ne.vec_id = bp.neighbor_id AND ne.i = qe.i
      GROUP BY 1, 2),
    scored AS (
      SELECT query_id, neighbor_id,
             ROUND(dot / (nq.nrm * nn.nrm), 6) AS cosine
      FROM pair_dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nn ON nn.vec_id = neighbor_id)
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= 5
    """,
    doc=(
        "IVF ANN: deterministic stride centroids, nearest-centroid assignment, "
        "search only the query's bucket — the 1/C-cost scale path."
    ),
)
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    return topk_ivf(e, q, "vec_id", "embedding", centroid_stride=STRIDE, k=5).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )


@register(
    "embedding_stats",
    f"""
    WITH {_UNNEST_NORM}
    SELECT e.vec_id, e.label,
           CAST(len(e.embedding) AS INTEGER) AS dim,
           ROUND(n.nrm, 6) AS l2_norm,
           CAST(e.embedding[1] AS DOUBLE) AS first_component,
           CAST(e.embedding[64] AS DOUBLE) AS last_component
    FROM embeddings e JOIN norms n ON n.vec_id = e.vec_id
    """,
    doc="array-function surface over embeddings: size, exact L2 norm, element access.",
)
def embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        "label",
        F.size(emb).alias("dim"),
        F.round(norm_exact(emb), 6).alias("l2_norm"),
        F.element_at(emb, 1).cast("double").alias("first_component"),
        F.element_at(emb, 64).cast("double").alias("last_component"),
    )

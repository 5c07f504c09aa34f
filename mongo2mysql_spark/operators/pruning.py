"""Difficulty-based data pruning (extension layer).

Sorscher, Geirhos, Shekhar, Ganguli, Morcos, "Beyond neural scaling
laws: beating power law scaling via data pruning" (NeurIPS 2022):
score each example by its distance to its cluster prototype and prune
the most prototypical (easiest) examples PER CLUSTER — keeping the
hardest ``keep_frac`` of every cluster preserves coverage where a
global threshold would empty whole regions of the distribution.

Scale shape: assignment is a scan × fixed-C broadcast of centroids
(C is capped, so the pass stays linear in corpus size; swap in
``operators/kmeans`` centroids for real runs — the plan is identical);
the per-cluster rank is ONE shuffle on the cluster key.  No global
sort, no collect.

Determinism contract: prototype cosine is the rounded sequential fold
(functions/vector.py) with id tie-breaks; the keep rule compares
integers only (``rank · denom ≤ num · cluster_n``) — a float
``keep_frac · n`` threshold would diverge cross-engine because a
DuckDB ``0.7`` literal is DECIMAL while Spark's is DOUBLE.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def prune_prototypes(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    centroid_stride: int,
    k_max: int,
    keep_frac: Fraction = Fraction(7, 10),
) -> DataFrame:
    """(id, proto_cid, proto_cos, proto_rank, cluster_n, keep_hard).

    ``proto_cid`` is the nearest stride-sampled centroid (rounded
    cosine, centroid-id tie-break), ``proto_rank`` ranks the cluster
    easiest-last (ascending cosine = hardest first), and ``keep_hard``
    keeps the hardest ``keep_frac`` of each cluster:
    ``rank · denominator ≤ numerator · cluster_n`` — integer-exact on
    any engine."""
    from mongo2mysql_spark.functions.vector import cosine_seq

    cents = vectors.filter(
        (F.col(id_col) % centroid_stride == 0)
        & (F.col(id_col) < centroid_stride * k_max)
    ).select(
        F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cv")
    )
    scored = vectors.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        F.col("__cid"),
        cosine_seq(F.col(vec_col), F.col("__cv")).alias("pcos"),
    )
    # argmin as a max_by AGGREGATE (the queries/dedup.py 'canon'
    # pattern), not a row_number window: the window shuffles all
    # k_max copies of the corpus on the id key; max_by partial-
    # aggregates map-side so one row per (partition, id) shuffles.
    # Ordering (coalesced pcos, −cid) ≡ (pcos DESC NULLS LAST, cid ASC).
    assigned = scored.groupBy(id_col).agg(
        F.max_by(
            F.struct(F.col("__cid").alias("__cid"), F.col("pcos").alias("pcos")),
            F.struct(
                F.coalesce(F.col("pcos"), F.lit(float("-inf"))).alias("c"),
                (-F.col("__cid")).alias("nc"),
            ),
        ).alias("__best")
    ).select(
        id_col,
        F.col("__best.__cid").alias("__cid"),
        F.col("__best.pcos").alias("pcos"),
    )
    w_rank = Window.partitionBy("__cid").orderBy(
        F.col("pcos").asc(), F.col(id_col).asc()
    )
    w_n = Window.partitionBy("__cid")
    return assigned.select(
        F.col(id_col),
        F.col("__cid").cast("long").alias("proto_cid"),
        F.col("pcos").alias("proto_cos"),
        F.row_number().over(w_rank).cast("int").alias("proto_rank"),
        F.count(F.lit(1)).over(w_n).cast("long").alias("cluster_n"),
    ).withColumn(
        "keep_hard",
        F.col("proto_rank") * F.lit(keep_frac.denominator)
        <= F.lit(keep_frac.numerator) * F.col("cluster_n"),
    )

"""Contrastive training-pair mining over an embedding corpus
(extension layer).

Embedding-model training (SimCSE, E5, GTE — all public recipes) wants
(anchor, positive, hard-negative) triplets mined from the corpus
itself: positives are near-duplicates of the anchor, hard negatives
are the highest-similarity neighbors that are NOT near-duplicates (the
informative band — random negatives are too easy, near-dup negatives
are false negatives).  This module composes operators the engine
already ships into that product surface:

1. anchors = a deterministic salted-hash sample of the corpus
   (operators/sampling.hash_sample_flag) — triplet count is bounded by
   the sample, not the corpus;
2. one ANN pass (operators/similarity.topk_ivf — bucketed, broadcast
   anchors, calibrated nprobe) retrieves each anchor's neighborhood;
3. the neighborhood splits by exact cosine: the top neighbor at or
   above ``pos_min_cos`` becomes the positive, the top neighbor at or
   below ``neg_max_cos`` becomes the hard negative; anchors missing
   either emit nothing.

Scale shape: cost = one IVF search of |anchors| queries (broadcast-
size by construction: anchors are a sample) + two window-ranked
filters over the retrieved candidates — never corpus × corpus.  At
100 TB, raise the IVF centroid count and keep the anchor sample
bounded per mining round.

Determinism: IVF with fixed centroids is deterministic; ties break on
neighbor id; cosine is the exact-decimal pair cosine (_pair_cosine) so
band membership is reproducible across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from mongo2mysql_spark.operators.sampling import hash_sample_flag
from mongo2mysql_spark.operators.similarity import topk_ivf


def mine_contrastive_triplets(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    anchor_frac: float = 0.1,
    k: int = 10,
    pos_min_cos: float = 0.9,
    neg_max_cos: float = 0.8,
    nprobe: int = 4,
    centroid_stride: int = 97,
    centroids: DataFrame | None = None,
    salt: str = "anchors",
) -> DataFrame:
    """(anchor_id, positive_id, pos_cos, negative_id, neg_cos) — one
    triplet per anchor that has both a qualifying positive and a
    qualifying hard negative among its top-k retrieved neighbors.

    ``pos_min_cos`` > ``neg_max_cos`` leaves a guard band: neighbors
    inside (neg_max_cos, pos_min_cos) are AMBIGUOUS (possible false
    negatives) and are used as neither — the standard mining
    precaution.
    """
    if not pos_min_cos > neg_max_cos:
        raise ValueError("pos_min_cos must exceed neg_max_cos (guard band)")
    anchors = embeddings.filter(
        hash_sample_flag(F.col(id_col), anchor_frac, salt=salt) == 1
    )
    hood = topk_ivf(
        embeddings,
        anchors,
        id_col,
        vec_col,
        k=k,
        nprobe=nprobe,
        centroid_stride=centroid_stride,
        centroids=centroids,
    ).select("query_id", "neighbor_id", "cosine")
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    pos = (
        hood.filter(F.col("cosine") >= pos_min_cos)
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select(
            F.col("query_id").alias("anchor_id"),
            F.col("neighbor_id").alias("positive_id"),
            F.col("cosine").alias("pos_cos"),
        )
    )
    neg = (
        hood.filter(F.col("cosine") <= neg_max_cos)
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select(
            F.col("query_id").alias("anchor_id"),
            F.col("neighbor_id").alias("negative_id"),
            F.col("cosine").alias("neg_cos"),
        )
    )
    return pos.join(neg, "anchor_id")

"""Semantic deduplication (SemDeDup-style) over embedding columns —
extension layer (SURVEY.md §2 EXT; no reference analogue, the reference
is a 559-LoC ETL porter with no vector surface).

``operators/dedup.embedding_neardup_pairs`` finds cosine near-dups
*within a caller-supplied blocking key* (label in the tests).  Real
corpora have no such label — the SemDeDup recipe (Abbas et al. 2023,
arXiv:2303.09540) *learns* the blocks: k-means-cluster the embeddings,
then compare pairs only within a cluster, keeping one representative
per semantically-identical group.

This module is that composition, entirely from existing pieces:

1. ``kmeans_fit`` (deterministic stride init, Lloyd iteration) learns
   ``~N/stride`` centroids;
2. ``kmeans_assign`` gives every vector exactly one cluster — the
   blocking key;
3. ``embedding_neardup_pairs`` runs the within-cluster pairwise cosine
   (quadratic only in cluster size, never in corpus size);
4. ``connected_components`` (large-star/small-star, diameter-free)
   closes the pair graph transitively;
5. the keeper per component is the smallest id — deterministic, same
   contract as ``dedup_exact``.

Scale shape: steps 1-2 are the k-means plan (broadcast centroids, one
narrow corpus pass per iteration, posexplode mean update — nothing
quadratic); step 3's cost is sum(cluster_size²), bounded by choosing
the centroid count so the expected cluster size is small (stride ~=
sqrt(N) gives ~sqrt(N)-sized clusters); steps 4-5 are O(E log² N)
rounds.  The corpus is never collected and no all-pairs join exists.
At 100 TB the only knob that changes is ``init_stride`` (denser
centroids → smaller clusters → less pairwise work) and fitting k-means
on a hash-sample (see kmeans_fit docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo2mysql_spark.operators.components import connected_components
from mongo2mysql_spark.operators.dedup import embedding_neardup_pairs
from mongo2mysql_spark.operators.kmeans import kmeans_assign, kmeans_fit


def semantic_dedup_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    min_cosine: float = 0.9,
    init_stride: int = 97,
    kmeans_iters: int = 4,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Within-cluster cosine near-dup pairs ``(id_1, id_2, cosine)``.

    ``centroids`` short-circuits the fit (reuse across corpus versions
    or fit on a sample); otherwise k-means runs here.
    """
    if centroids is None:
        centroids, _ = kmeans_fit(
            corpus, id_col, vec_col, init_stride=init_stride, max_iter=kmeans_iters
        )
    assigned = kmeans_assign(corpus, centroids, id_col, vec_col)
    return embedding_neardup_pairs(
        assigned, id_col, vec_col, block_col="centroid_id", min_cosine=min_cosine
    )


def semantic_dedup(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    min_cosine: float = 0.9,
    init_stride: int = 97,
    kmeans_iters: int = 4,
    centroids: DataFrame | None = None,
    blocking: str = "kmeans",
) -> DataFrame:
    """Per-id keep verdict: ``(id, group_id, is_kept)``.

    ``group_id`` is the smallest id in the vector's semantic-duplicate
    component (its own id when it has no near-dups); ``is_kept`` marks
    the one representative per group.  ``corpus.filter(is_kept)`` is the
    deduplicated corpus; the dropped fraction is SemDeDup's headline
    metric.

    ``blocking`` picks the candidate-generation backend: ``"kmeans"``
    (learned clusters — better recall near cluster cores, costs Lloyd
    iterations) or ``"rp_lsh"`` (signed-random-projection buckets —
    iteration-free, recall tuned by table count).  Both feed the same
    exact within-block scoring, components, and keeper selection.
    """
    if blocking == "kmeans":
        pairs = semantic_dedup_pairs(
            corpus, id_col, vec_col, min_cosine, init_stride, kmeans_iters, centroids
        )
    elif blocking == "rp_lsh":
        pairs = rp_lsh_neardup_pairs(corpus, id_col, vec_col, min_cosine)
    else:
        raise ValueError(f"unknown blocking backend: {blocking!r}")
    comp = connected_components(pairs, "id_1", "id_2")
    ids = corpus.select(F.col(id_col).alias("id"))
    return (
        ids.join(comp, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("component"), F.col("id")).alias("group_id"),
        )
        .withColumn("is_kept", F.col("id") == F.col("group_id"))
    )


# ----------------------------------- random-projection LSH blocking


def rp_lsh_bits(vec, n_bits: int = 16, seed: int = 0):
    """Signed-random-projection signature (Charikar 2002 SimHash for
    real vectors): bit j is the sign of <v, h_j> where hyperplane
    h_j's components are deterministic ±1 pseudo-randoms derived from
    ``xxhash64(seed, j, dim_index)`` — no RNG object, so the signature
    is reproducible across runs, partitions, and engines.

    Pure column expression (transform + aggregate per bit — all
    whole-stage-codegen): cost is n_bits × dim multiply-adds per row,
    one narrow pass, no shuffle.
    """
    bits = F.lit(0).cast("long")
    for j in range(n_bits):
        # ±1 per (seed, bit, position): cheap xxhash parity
        proj = F.aggregate(
            F.transform(
                vec,
                lambda x, i: x.cast("double")
                * (
                    (F.xxhash64(F.lit(seed), F.lit(j), i) % 2 == 0).cast("int") * 2 - 1
                ).cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits = bits + F.when(proj >= 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
    return bits


def rp_lsh_neardup_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    min_cosine: float = 0.9,
    n_bits: int = 12,
    seeds: tuple[int, ...] = (0, 1),
) -> DataFrame:
    """Cosine near-dup pairs via random-projection bucket blocking —
    the iteration-free alternative to the k-means blocks: vectors
    agreeing on all ``n_bits`` signs of one projection table land in a
    bucket; pairs are scored exactly within buckets only.  Multiple
    ``seeds`` are independent hash tables OR-ed together (standard LSH
    amplification — collision probability per table is
    (1 - θ/π)^n_bits, so tables sum recall while each stays cheap).
    Bucket sizes concentrate at N/2^n_bits: pick n_bits ~ log2(N) the
    same way stride tracks √N for the k-means path.
    """
    pair_frames = []
    for s in seeds:
        with_bucket = corpus.select(
            F.col(id_col), F.col(vec_col),
            rp_lsh_bits(F.col(vec_col), n_bits, seed=s).alias("__bucket"),
        )
        pair_frames.append(
            embedding_neardup_pairs(
                with_bucket, id_col, vec_col, block_col="__bucket",
                min_cosine=min_cosine,
            )
        )
    out = pair_frames[0]
    for p in pair_frames[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates(["id_1", "id_2"])

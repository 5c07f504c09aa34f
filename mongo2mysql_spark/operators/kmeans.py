"""DataFrame-native k-means (Lloyd iteration) over embedding columns —
the production centroid path for IVF ANN (extension layer).

`operators/similarity.topk_ivf` uses deterministic stride-sampled
centroids so results are seed-free reproducible; its docstring notes
that production would k-means-iterate the same assignment plan.  This
module IS that iteration, still fully deterministic:

- **init**: the same stride sample (every ``stride``-th vector by id) —
  no RNG, so run-to-run and engine-to-engine reproducible;
- **assign**: nearest centroid by cosine via the broadcast one-pass
  `assign_centroids` (ties break on centroid id);
- **update**: element-wise mean of each cluster via ``posexplode ->
  groupBy(cluster, pos) avg -> re-assemble`` — the dimension axis is
  exploded into narrow (cluster, pos, value) rows, so no collect_list
  ever materializes a cluster's member set in one task (the classic
  OOM of naive Spark k-means); shuffle volume is dim x N skinny rows
  per iteration;
- **convergence**: iterate a fixed budget or until total centroid drift
  (sum of per-centroid squared movement) falls under ``tol``; inertia
  (sum of 1 - cosine to the assigned centroid) is computed per round
  and is non-increasing — asserted in tests.

Scale shape per iteration: one broadcast of C centroids (C x dim
doubles — small by construction), one narrow corpus pass to assign, one
posexplode shuffle keyed (cluster, pos) with map-side partial averages.
Nothing is quadratic; the corpus is never collected.  At 100 TB, run
the iteration on a deterministic hash-sample of the corpus (centroids
need only a representative sample) and do the final single assignment
pass over everything — the same plan this module emits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo2mysql_spark.operators.similarity import assign_centroids


def _mean_by_cluster(assigned: DataFrame, vec_col: str) -> DataFrame:
    """Element-wise cluster means without collecting members: explode
    the dimension axis, average per (cluster, position), re-assemble
    ordered arrays."""
    exploded = assigned.select(
        "centroid_id", F.posexplode(F.col(vec_col)).alias("__pos", "__v")
    )
    per_dim = exploded.groupBy("centroid_id", "__pos").agg(
        F.avg(F.col("__v").cast("double")).alias("__mean")
    )
    return (
        per_dim.groupBy("centroid_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__pos"), F.col("__mean")))
            ).alias("__pairs")
        )
        .select(
            "centroid_id",
            F.transform(F.col("__pairs"), lambda p: p.getField("__mean").cast("float")).alias(
                vec_col
            ),
        )
    )


def kmeans_fit(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    init_stride: int = 97,
    max_iter: int = 10,
    tol: float = 1e-6,
) -> tuple[DataFrame, list[float]]:
    """Lloyd iteration; returns ``(centroids, inertia_history)``.

    ``centroids`` is a DataFrame (centroid_id, <vec_col>) — centroid ids
    are the ORIGINAL vector ids of the stride init, stable across
    iterations so assignments can be compared round-to-round.  The
    per-round inertia (mean of 1 - cosine to the assigned centroid) is
    returned for convergence monitoring and asserted non-increasing in
    tests.

    Deterministic by construction: stride init, id-tiebroken
    assignment, exact per-dimension averages — same input, same
    centroids, every run and engine.
    """
    centroids = corpus.filter(F.col(id_col) % init_stride == 0).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col)
    )
    history: list[float] = []
    for _ in range(max_iter):
        assigned = assign_centroids(
            corpus,
            centroids.select(F.col("centroid_id").alias(id_col), vec_col),
            id_col,
            vec_col,
        )
        # inertia ride-along: one extra agg over the assignment pass
        from mongo2mysql_spark.functions.vector import dot_seq, norm_seq

        cent = centroids.select(
            F.col("centroid_id").alias("__cid"), F.col(vec_col).alias("__cvec")
        )
        inertia_row = (
            assigned.join(F.broadcast(cent), F.col("centroid_id") == F.col("__cid"))
            .select(
                (
                    F.lit(1.0)
                    - dot_seq(F.col(vec_col), F.col("__cvec"))
                    / (norm_seq(F.col(vec_col)) * norm_seq(F.col("__cvec")))
                ).alias("__d")
            )
            .agg(F.avg("__d"))
            .first()
        )
        history.append(float(inertia_row[0]))
        new_centroids = _mean_by_cluster(
            assigned.select("centroid_id", vec_col), vec_col
        ).localCheckpoint()
        # drift = total squared movement of surviving centroids
        old = centroids.select(
            F.col("centroid_id"), F.col(vec_col).alias("__old")
        )
        drift_row = (
            new_centroids.join(old, "centroid_id")
            .select(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        F.col("__old"),
                        lambda a, b: (a.cast("double") - b.cast("double"))
                        * (a.cast("double") - b.cast("double")),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("__m")
            )
            .agg(F.sum("__m"))
            .first()
        )
        centroids = new_centroids
        if drift_row[0] is not None and float(drift_row[0]) <= tol:
            break
    return centroids, history


def kmeans_assign(
    corpus: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Final single-pass assignment of every vector to its fitted
    centroid — the inverted-list build for `topk_ivf`-style search over
    k-means buckets."""
    return assign_centroids(
        corpus,
        centroids.select(F.col("centroid_id").alias(id_col), vec_col),
        id_col,
        vec_col,
    )

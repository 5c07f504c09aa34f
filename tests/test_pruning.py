"""Prototype-difficulty pruning tests (operators/pruning.py);
cross-engine parity is covered by the embedding_stats 'prune' branch."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from mongo2mysql_spark.operators.pruning import prune_prototypes

SF = "/root/testdata/sf0.001"


def test_prune_keeps_hardest_fraction_per_cluster(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = prune_prototypes(
        e, "vec_id", "embedding", centroid_stride=7, k_max=4,
        keep_frac=Fraction(1, 2),
    ).collect()
    assert len(out) == e.count()  # every vector scored exactly once
    clusters: dict = {}
    for r in out:
        clusters.setdefault(r.proto_cid, []).append(r)
    assert len(clusters) > 1
    for cid, rows in clusters.items():
        n = rows[0].cluster_n
        assert len(rows) == n
        kept = [r for r in rows if r.keep_hard]
        # floor(n/2) kept — the integer rule rank*2 <= 1*n
        assert len(kept) == n // 2
        # kept rows are exactly the LOWEST-cosine (hardest) ones
        cutoff = sorted(r.proto_cos for r in rows)[: n // 2]
        assert sorted(r.proto_cos for r in kept) == cutoff
        # ranks are dense 1..n
        assert sorted(r.proto_rank for r in rows) == list(range(1, n + 1))


def test_prune_assignment_is_nearest_centroid(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = prune_prototypes(
        e, "vec_id", "embedding", centroid_stride=7, k_max=4
    )
    # a centroid vector is its own prototype at cosine 1.0 and is the
    # easiest (last-ranked) member of its cluster
    selfrows = out.filter(F.col("vec_id") == F.col("proto_cid")).collect()
    assert selfrows
    for r in selfrows:
        assert r.proto_cos == 1.0
        assert r.proto_rank == r.cluster_n
        assert not r.keep_hard  # most prototypical -> pruned

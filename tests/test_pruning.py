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


# ------------------------------------------- interval overlap join (binned)


def test_interval_overlap_join_equals_bruteforce(spark):
    """operators/rangejoin.interval_overlap_join_binned: the
    bin-fragmented plan returns EXACTLY the brute-force overlap pairs
    at several bin widths (including widths smaller and larger than
    every interval), with each pair emitted exactly once."""
    import itertools

    from pyspark.sql import functions as F

    from mongo2mysql_spark.operators.rangejoin import (
        interval_overlap_join_binned,
    )

    lrows = [(i, s, s + ln) for i, (s, ln) in enumerate(
        [(0, 5), (10, 1), (63, 2), (64, 0), (100, 40), (-30, 25), (-130, 5)]
    )]
    rrows = [(j, s, s + ln) for j, (s, ln) in enumerate(
        [(3, 4), (11, 0), (60, 10), (90, 60), (-20, 3), (-200, 500)]
    )]
    left = spark.createDataFrame(lrows, "lid int, ls long, le long")
    right = spark.createDataFrame(rrows, "rid int, rs long, re long")
    want = sorted(
        (li, rj)
        for (li, ls, le), (rj, rs, re) in itertools.product(lrows, rrows)
        if ls <= re and le >= rs
    )
    assert want  # non-trivial fixture
    for width in (1, 7, 64, 1000):
        got = sorted(
            (r.lid, r.rid)
            for r in interval_overlap_join_binned(
                left, right, "ls", "le", "rs", "re", bin_width=width
            ).collect()
        )
        assert got == want, f"width={width}"


def test_floor_bin_expr_is_uniform_grid(spark):
    """floor_bin_expr must be exact FLOOR division (a uniform grid):
    truncating DIV gave bin 0 a double width spanning (-w, w) — non-
    aligned for negative coordinates, inflating candidates near zero."""
    from pyspark.sql import functions as F

    from mongo2mysql_spark.operators.rangejoin import floor_bin_expr

    vals = list(range(-25, 26))
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    for w in (1, 7, 10):
        got = {
            r.x: r.b
            for r in df.select(
                "x", F.expr(floor_bin_expr("x", w)).alias("b")
            ).collect()
        }
        assert got == {v: v // w for v in vals}, f"width={w}"
        # grid uniformity: every bin covers exactly w consecutive ints
        from collections import Counter

        widths = Counter(got.values())
        inner = {b: c for b, c in widths.items()
                 if b not in (min(widths), max(widths))}  # edge bins clip
        assert set(inner.values()) <= {w}


def test_interval_overlap_join_no_nested_loop(spark):
    """The binned plan must not contain BroadcastNestedLoopJoin or
    CartesianProduct — the whole point of the fragmentation."""
    from pyspark.sql import functions as F

    from mongo2mysql_spark.operators.rangejoin import (
        interval_overlap_join_binned,
    )

    left = spark.range(100).select(
        F.col("id").alias("lid"), (F.col("id") * 3).alias("ls"),
        (F.col("id") * 3 + 10).alias("le"),
    )
    right = spark.range(20).select(
        F.col("id").alias("rid"), (F.col("id") * 11).alias("rs"),
        (F.col("id") * 11 + 5).alias("re"),
    )
    plan = (
        interval_overlap_join_binned(left, right, "ls", "le", "rs", "re", 16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

"""Round-6 scaling probes: wall ratio at 10x input for the new
operators (PQ encode/ADC, prototype pruning, RRF legs+fusion, UniMax,
patchify).  Mirrors the COVERAGE.md probe methodology: perturbed 10x
replication so replicas are near-dups, best-of-2 wall, local[32].

Usage: python tools/probe_r6.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
from fractions import Fraction

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mongo2mysql_spark.session import build_session  # noqa: E402
from mongo2mysql_spark.sources.parquet import load_table  # noqa: E402


def replicate_vectors(e, times: int):
    """10x near-dup replication: shift ids, perturb one component via a
    deterministic per-replica scale on the first element."""
    parts = [e.select("vec_id", "embedding")]
    n = 100000
    for i in range(1, times):
        parts.append(
            e.select(
                (F.col("vec_id") + i * n).alias("vec_id"),
                F.transform(
                    "embedding", lambda v: v * (1.0 + i * 1e-3)
                ).alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def replicate_docs(d, times: int):
    parts = [d.select("doc_id", "source", "text")]
    n = 100000
    for i in range(1, times):
        parts.append(
            d.select(
                (F.col("doc_id") + i * n).alias("doc_id"),
                F.concat(F.col("source"), F.lit(f"_{i}")).alias("source"),
                F.concat(F.col("text"), F.lit(f" r{i}")).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def best2(fn) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="probe-r6")
    e1 = load_table(spark, sf_dir, "embeddings")
    d1 = load_table(spark, sf_dir, "documents")
    e10 = replicate_vectors(e1, 10).localCheckpoint()
    d10 = replicate_docs(d1, 10).localCheckpoint()
    e1 = e1.localCheckpoint()
    d1 = d1.localCheckpoint()

    from mongo2mysql_spark.operators.fusion import ranked_topk, rrf_fuse
    from mongo2mysql_spark.operators.pq import (
        collect_codebook,
        pq_adc_topk,
        pq_encode,
    )
    from mongo2mysql_spark.operators.pruning import prune_prototypes
    from mongo2mysql_spark.operators.unimax import unimax_mixture

    def pq_pass(e):
        cb = collect_codebook(e, "vec_id", "embedding", 8, 31, 16)
        codes = pq_encode(e, "vec_id", "embedding", cb)
        noop(
            pq_adc_topk(
                codes, e.filter(F.col("vec_id") < 5), e, "vec_id", "embedding", cb
            )
        )

    def prune_pass(e):
        noop(prune_prototypes(e, "vec_id", "embedding", 97, 32))

    def rrf_pass(e):
        dense = e.crossJoin(
            F.broadcast(
                e.filter(F.col("vec_id") == 0).select(
                    F.col("embedding").alias("__qv")
                )
            )
        ).select(
            F.col("vec_id").alias("doc_id"),
            F.aggregate(
                F.zip_with(
                    "embedding",
                    "__qv",
                    lambda a, b: a.cast("double") * b.cast("double"),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("s"),
        )
        leg1 = ranked_topk(dense, "doc_id", "s", 50)
        leg2 = ranked_topk(
            dense.select("doc_id", (F.col("s") * -1).alias("s")), "doc_id", "s", 50
        )
        noop(rrf_fuse({"a": leg1, "b": leg2}))

    def unimax_pass(d):
        noop(
            unimax_mixture(
                d, "source", F.size(F.split("text", " ")).cast("long"),
                Fraction(1, 2), 2,
            )
        )

    for name, fn in (
        ("pq_encode_adc", pq_pass),
        ("prune_prototypes", prune_pass),
        ("rrf_legs_fuse", rrf_pass),
    ):
        t1 = best2(lambda: fn(e1))
        t10 = best2(lambda: fn(e10))
        print(f"{name}: 1x={t1:.2f}s 10x={t10:.2f}s ratio={t10 / t1:.2f}")
    for name, fn in (("unimax_mixture", unimax_pass),):
        t1 = best2(lambda: fn(d1))
        t10 = best2(lambda: fn(d10))
        print(f"{name}: 1x={t1:.2f}s 10x={t10:.2f}s ratio={t10 / t1:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Unsupervised domain discovery over raw text (extension layer —
the "cluster, then balance" recipe of large-scale pretraining-data
mixing: discover latent domains with k-means over cheap hashed text
features, then reweight/cap per discovered domain; cf. the clustering
stages of DoReMi-style mixture tuning and SlimPajama-style curation.
The reference's 556-LoC ETL core has no text surface).

Feature space: hashed unigram+bigram term frequencies
(:func:`mongo2mysql_spark.operators.dsir.hashed_grams` — the SAME
portable md5-bucket stream DSIR fits, reused at a small bucket count)
densified to an ``n_buckets``-dim vector of integer PERMILLE weights:
``vec[i] = (count_i * 1000) div total``.  Permille integerization does
two jobs at once: it length-normalizes (a 10k-token page and a
100-token page with the same term mix land on essentially the same
point — exact up to permille flooring and the bigrams that straddle
content boundaries) and it keeps
every feature value INTEGER, so Lloyd cluster sums are exact at any
partitioning/order with no decimal contract — the same
order-free-by-integer-arithmetic scheme the PageRank and trained-PQ
oracles use.

Algorithm: seeds = the k lowest-id documents whose id is divisible by
``stride`` (deterministic, seed-free); ``iters`` Lloyd rounds, each
one assignment pass + one exact mean update; one final assignment.
Every argmin resolves min(d²) FIRST then min(seed-label) among
exact-equals, so float ties can't fork engines; d² is the fixed-order
squared-L2 fold (operators/diversify.l2sq_seq ↔ sql_l2sq).

Scale shape:
- densify: one explode of the gram stream + one groupBy(id) with
  ``n_buckets`` map-side-combined conditional SUMs — one shuffle at
  document cardinality, no pivot, no UDF;
- assignment: documents × k broadcast centroids (k bounded) — a
  map-only scoring pass + one two-phase argmin agg;
- Lloyd update: one explode to (domain, position) cells —
  k·n_buckets groups, integer SUM/COUNT partials combine map-side;
- nothing anywhere is corpus × corpus.

Cluster labels are the SEED DOC IDS (stable across iterations — an
empty cluster simply vanishes); sizes/shares feed the mixing stages
(operators/unimax.py, operators/sampling.py) directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo2mysql_spark.operators.diversify import l2sq_seq
from mongo2mysql_spark.operators.dsir import hashed_grams


def doc_permille_vectors(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 32,
    salt: str = "domains",
) -> DataFrame:
    """(id, vec) — hashed-TF permille profile per document, dropping
    documents that produce no grams (NULL text — nothing to cluster).
    ``vec`` is array<double> whose values are exact small integers."""
    grams = hashed_grams(df, id_col, text_col, m=n_buckets, salt=salt)
    counts = grams.groupBy(F.col(id_col).alias("id")).agg(
        *[
            F.sum(F.when(F.col("bucket") == i, 1).otherwise(0)).alias(f"b{i}")
            for i in range(n_buckets)
        ]
    )
    tot = F.col("b0")
    for i in range(1, n_buckets):
        tot = tot + F.col(f"b{i}")
    vec = F.array(
        *[
            F.expr(f"CAST((b{i} * 1000) DIV __tot AS DOUBLE)")
            for i in range(n_buckets)
        ]
    )
    return (
        counts.withColumn("__tot", tot)
        .filter(F.col("__tot") > 0)
        .select("id", vec.alias("vec"))
    )


def assign_domains(
    vecs: DataFrame, cents: DataFrame
) -> DataFrame:
    """(id, domain, d2): nearest centroid per document — broadcast the
    bounded centroid frame, fixed-order d² fold, min-d²-then-min-label
    tie resolve."""
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        "id", "cid", l2sq_seq(F.col("vec"), F.col("cvec")).alias("d2")
    )
    best = scored.groupBy("id").agg(F.min("d2").alias("best"))
    return (
        scored.join(best, "id")
        .filter(F.col("d2") == F.col("best"))
        .groupBy("id", "best")
        .agg(F.min("cid").alias("domain"))
        .select("id", "domain", F.col("best").alias("d2"))
    )


def lloyd_update(
    assign: DataFrame, vecs: DataFrame, n_buckets: int
) -> DataFrame:
    """Exact cluster means: integer SUM per (domain, position) — the
    permille features are integers, so partials are order-free — then
    ONE IEEE division per cell; arrays rebuilt position-sorted."""
    cells = (
        assign.join(vecs, "id")
        .select("domain", F.posexplode("vec").alias("pos", "val"))
        .groupBy("domain", "pos")
        .agg(
            F.sum(F.col("val").cast("long")).alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
    )
    mean = (F.col("s").cast("double") / F.col("c").cast("double")).alias("m")
    return (
        cells.select("domain", "pos", mean)
        .groupBy("domain")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "m"))),
                lambda x: x.getField("m"),
            ).alias("cvec")
        )
        .select(F.col("domain").alias("cid"), "cvec")
    )


def discover_domains(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 32,
    k: int = 6,
    stride: int = 83,
    iters: int = 1,
    salt: str = "domains",
) -> DataFrame:
    """Full pipeline: features → stride seeds → ``iters`` Lloyd rounds
    → final assignment.  Returns (id, domain, d2); domain labels are
    seed doc ids."""
    # EAGER checkpoints: assignment/Lloyd reference vecs (and each
    # round's cents) repeatedly — lazy checkpoints would leave the deep
    # logical tree to be re-analyzed at every reference (the same
    # driver-side analyzer cost the diversify greedy measured)
    vecs = doc_permille_vectors(
        df, id_col, text_col, n_buckets=n_buckets, salt=salt
    ).localCheckpoint()
    seeds = (
        vecs.filter(F.col("id") % stride == 0)
        .orderBy("id")
        .limit(k)
        .select(F.col("id").alias("cid"), F.col("vec").alias("cvec"))
    )
    cents = seeds.localCheckpoint()
    # Seed underflow is SILENT otherwise: fewer than k ids divisible by
    # stride (or non-numeric ids filtering everything) would cluster
    # into fewer domains than requested, and the oracle — which mirrors
    # the same seed rule — could never flag it.  The count is driver-
    # side but bounded: cents is a ≤k-row checkpointed frame.
    n_seeds = cents.count()
    if n_seeds < k:
        raise ValueError(
            f"discover_domains: only {n_seeds} seed docs satisfy "
            f"id % {stride} == 0 — need k={k}; lower `stride` or `k`"
        )
    for _ in range(iters):
        assign = assign_domains(vecs, cents)
        cents = lloyd_update(assign, vecs, n_buckets).localCheckpoint()
    return assign_domains(vecs, cents)


def domain_sizes(assign: DataFrame) -> DataFrame:
    """(domain, n_docs, share) — the mixing-stage input; share is one
    int-over-int IEEE division."""
    sizes = assign.groupBy("domain").agg(F.count(F.lit(1)).alias("n_docs"))
    # 1-row broadcast total crossJoined in (Catalyst folds any
    # constant-key equi-join back to the same BroadcastNestedLoopJoin,
    # so state the shape directly; k-bounded × 1 row — never quadratic)
    total = assign.groupBy().agg(F.count(F.lit(1)).alias("__t"))
    return sizes.crossJoin(F.broadcast(total)).select(
        "domain",
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("__t").cast("double")).alias(
            "share"
        ),
    )

"""KMV / theta-style distinct-count sketches with SET-OPERATION
estimates (Bar-Yossef et al., RANDOM 2002 "Counting distinct elements
in a data stream" — the K-minimum-values estimator; Dasgupta et al.,
"Theta Sketch Framework", the set-operation algebra production sketch
libraries ship.  Extension layer — sketch analytics; the reference's
556-LoC ETL core has none).

HyperLogLog (the engine's `agg_approx_sketches` slot) answers only
UNION-composable distinct counts, and its estimate bits are
engine-internal (the oracle can only assert error-band verdicts).
KMV is the complement on both axes:

- **set algebra**: a KMV sketch is a uniform sample of the hash space
  below a threshold θ (= the K-th smallest hash).  Two sketches
  combine at common θ' = min(θ_a, θ_b): union = K smallest of the
  merged samples; intersection estimate = |{h ∈ A-samples ∩
  B-samples : h ≤ θ'}| / θ' — the estimate HLL fundamentally cannot
  give without inclusion-exclusion error blowup;
- **portability**: every quantity is integer (48-bit md5-prefix
  hashes, counts, thresholds) plus ONE IEEE division per estimate —
  so unlike HLL, the ESTIMATES THEMSELVES hash bit-identically
  against a DuckDB restatement.  RSE ≈ 1/sqrt(K−2) (~6% at K=256).

Scale shape: the sketch build is `distinct hash → K smallest`, which
plans as TakeOrderedAndProject — per-partition partial top-K, then a
K·partitions merge; no full sort, no corpus-sized shuffle.  Sketches
are K-row frames; every set operation is a join/union of K-row frames.
Mergeability (sketch(A ∪ B) from sketch(A), sketch(B) alone) is what
lets per-partition/per-day partials roll up without rescanning raw
rows — the distinct-count analogue of the hypertable rollup, now WITH
intersections.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_SPACE = float(1 << 48)  # exact in double


def kmv_hash(col: Column, salt: str = "kmv") -> Column:
    """Portable 48-bit hash: md5-prefix integer, identical in DuckDB
    as CAST('0x' || substr(md5('salt|' || v), 1, 12) AS BIGINT)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "|"), col.cast("string"))), 1, 12),
        16,
        10,
    ).cast("long")


def kmv_sketch(df: DataFrame, col: str, k: int, salt: str = "kmv") -> DataFrame:
    """The K smallest distinct hashes of ``col`` — a (h) frame of at
    most K rows (TakeOrderedAndProject; no full sort)."""
    return (
        df.select(kmv_hash(F.col(col), salt).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_stats(sketch: DataFrame, k: int) -> DataFrame:
    """1-row (cnt, theta, est): the estimate is exact (= cnt) while the
    sketch is unsaturated, else (K−1)·2^48/θ — integer operands, one
    fixed-order double product + division."""
    return sketch.agg(
        F.count(F.lit(1)).alias("cnt"), F.max("h").alias("theta")
    ).select(
        "cnt",
        "theta",
        F.when(F.col("cnt") < k, F.col("cnt").cast("double"))
        .otherwise(
            (F.lit(float(k - 1)) * F.lit(HASH_SPACE))
            / F.col("theta").cast("double")
        )
        .alias("est"),
    )


def kmv_union(a: DataFrame, b: DataFrame, k: int) -> DataFrame:
    """sketch(A ∪ B) from the two sketches alone (mergeable)."""
    return a.unionByName(b).distinct().orderBy("h").limit(k)


def kmv_intersect_est(a: DataFrame, b: DataFrame) -> DataFrame:
    """1-row (common, theta, est) intersection estimate at the common
    threshold θ' = min(θ_a, θ_b): samples strictly below θ' are a
    uniform hash-space sample of EACH set, so their overlap count over
    θ' estimates |A ∩ B|.  The threshold hash itself is EXCLUDED
    (h < θ', not ≤): θ' is the K-th order statistic of whichever
    sketch supplied it, not a uniform draw below itself — counting it
    biased the estimate up by ~est/common, and made this estimator
    inconsistent with ``kmv_stats``'s (K−1)/θ exclusive convention."""
    ta = a.agg(F.max("h").alias("__ta"))
    tb = b.agg(F.max("h").alias("__tb"))
    theta = (
        ta.crossJoin(tb)
        .select(F.least("__ta", "__tb").alias("theta"))
    )
    common = (
        a.join(b, "h")
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("theta"))
        .groupBy("theta")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    # LEFT join from theta so an empty intersection still yields a row
    return (
        theta.join(common, "theta", "left")
        .select(
            F.coalesce("common", F.lit(0)).alias("common"),
            "theta",
            (
                F.coalesce("common", F.lit(0)).cast("double")
                * F.lit(HASH_SPACE)
                / F.col("theta").cast("double")
            ).alias("est"),
        )
    )


def kmv_tuple_sketch(
    df: DataFrame, col: str, k: int, salt: str = "kmv"
) -> DataFrame:
    """Tuple sketch (the theta-sketch-with-summaries of production
    sketch libraries): the K smallest distinct key hashes, each
    CARRYING its row count — a uniform hash-space sample of the key
    domain with per-key multiplicities.  (h, cnt) frame of ≤ K rows.

    Build shape: one map-side-combined groupBy to key cardinality, then
    TakeOrderedAndProject (per-partition partial top-K) — no full sort,
    no corpus-sized shuffle."""
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(kmv_hash(F.col(col), salt).alias("h"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("h")
        .limit(k)
    )


def kmv_join_size_est(a: DataFrame, b: DataFrame) -> DataFrame:
    """1-row (common, theta, sum_products, est) equi-join cardinality
    estimate from two tuple sketches alone — the query-planner readout
    (join reordering, broadcast-vs-shuffle decisions) that neither HLL
    nor a plain KMV can give, because |A ⋈ B| = Σ_key cntA·cntB needs
    per-key multiplicities.

    Keys strictly below θ' = min(θ_a, θ_b) are a uniform sample of the
    key domain at rate θ'/2⁴⁸ (exclusive threshold — same convention as
    :func:`kmv_intersect_est`), so
    ``est = Σ_{common h < θ'} cntA·cntB · 2⁴⁸ / θ'``.
    All integer operands; the estimate is ONE double product + ONE IEEE
    division, so it hashes bit-for-bit cross-engine."""
    ta = a.agg(F.max("h").alias("__ta"))
    tb = b.agg(F.max("h").alias("__tb"))
    theta = ta.crossJoin(tb).select(F.least("__ta", "__tb").alias("theta"))
    bb = b.select(F.col("h"), F.col("cnt").alias("__cnt_b"))
    common = (
        a.join(bb, "h")
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("theta"))
        .groupBy("theta")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum(F.col("cnt") * F.col("__cnt_b")).alias("sum_products"),
        )
    )
    return theta.join(common, "theta", "left").select(
        F.coalesce("common", F.lit(0)).alias("common"),
        "theta",
        F.coalesce("sum_products", F.lit(0)).cast("long").alias("sum_products"),
        (
            F.coalesce("sum_products", F.lit(0)).cast("double")
            * F.lit(HASH_SPACE)
            / F.col("theta").cast("double")
        ).alias("est"),
    )

"""Product-quantization ANN (extension layer): PQ encode + ADC search.

Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011): split each d-dim vector into ``m`` subspaces,
quantize every subvector to its nearest subspace centroid, and search
by Asymmetric Distance Computation — the query builds one (m × k)
table of exact query↔centroid distances, and each corpus vector's
approximate distance is a sum of ``m`` table lookups indexed by its
stored codes.

Why this is the 100 TB lever: after encoding, the scan side of the
search touches ``m`` small ints per vector instead of ``d`` floats —
a 4·d/m byte cut (64-dim float32 → 8 codes = 32×), so the candidate
scan is bandwidth-bound on codes that fit in memory where the raw
vectors never would.  Exact re-scoring on the original floats touches
only the top candidates.

Spark shape:
- the codebook is deterministic (stride-sampled corpus vectors — the
  same device ``operators/similarity.topk_ivf`` uses so the oracle can
  restate it relationally; k-means codebooks via ``operators/kmeans``
  are the real-training path and swap in without changing the plan);
- ``collect_codebook`` is a BOUNDED collect (≤ ``k_max`` vectors);
- encode is a map-only narrow projection: the codebook enters the plan
  as nested array literals, so there is NO join and NO shuffle on the
  corpus side — 1000 executors encode 100 TB embarrassingly parallel;
- ADC joins the corpus codes against a BROADCAST per-query distance
  table; the only shuffle is the per-query top-k.

Determinism contract: subspace distances are sequential double folds
(bit-portable, functions/vector.py); the ADC sum accumulates the m
per-subspace distances in DECIMAL (order-free — the oracle's relational
SUM has no defined order), rounds to 6 decimals, and ranks with id
tie-breaks.  Argmin code assignment tie-breaks on the lowest centroid
id on both engines (array_position takes the FIRST minimum; the SQL
mirror orders by (d2, cid)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DEC = "decimal(30,12)"


def _l2sq_seq(a: Column, b: Column) -> Column:
    """Sequential double-fold squared L2 distance (same IEEE op order
    as the DuckDB mirror ``sql_l2sq``)."""
    diffs = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def sql_l2sq(a: str, b: str) -> str:
    """DuckDB mirror of :func:`_l2sq_seq` — identical fold order and
    0.0 seed."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), "
        f"z -> (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)) * "
        f"(CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)))), (acc, v) -> acc + v)"
    )


def normalize_vectors(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Unit-normalize vectors (array<double>) — the standard cosine-PQ
    recipe: on normalized vectors ``L2² = 2 − 2·cos``, so ADC becomes an
    angular metric and PQ top-k approximates cosine top-k.  Zero vectors
    pass through unscaled.  The division is one IEEE op per element with
    the norm from the portable sequential fold, so the DuckDB mirror
    (``v / nrm`` over ``sql_norm``) is bit-identical."""
    from mongo2mysql_spark.functions.vector import norm_seq

    staged = df.select(
        F.col(id_col),
        F.col(vec_col).alias("__v"),
        norm_seq(F.col(vec_col)).alias("__n"),
    )
    safe = F.when(F.col("__n") > 0, F.col("__n")).otherwise(F.lit(1.0))
    return staged.select(
        F.col(id_col),
        F.transform("__v", lambda v: v.cast("double") / safe).alias(vec_col),
    )


def collect_codebook(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    m_sub: int,
    stride: int,
    k_max: int,
) -> list[list[list[float]]]:
    """``cb[j][c]`` = subvector ``j`` of the corpus vector with id
    ``c·stride`` — a deterministic codebook both engines can restate.

    Bounded driver work: at most ``k_max`` full vectors come back
    (the codebook is index metadata, never corpus-sized)."""
    rows = (
        vectors.filter(
            (F.col(id_col) % stride == 0) & (F.col(id_col) < stride * k_max)
        )
        .select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .orderBy("__id")
        .collect()
    )
    if not rows:
        raise ValueError("empty PQ codebook: no vector id is a stride multiple")
    dim = len(rows[0]["__v"])
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible into {m_sub} subspaces")
    dsub = dim // m_sub
    return [
        [
            [float(r["__v"][j * dsub + i]) for i in range(dsub)]
            for r in rows
        ]
        for j in range(m_sub)
    ]


def _cb_literal(cb: list[list[list[float]]]) -> Column:
    """Nested array literal (m × k × dsub doubles) — ConstantFolding
    collapses it, so the codebook rides the plan, not a join."""
    return F.array(
        *[
            F.array(*[F.array(*[F.lit(x) for x in cent]) for cent in subj])
            for subj in cb
        ]
    )


def _sub(vec: Column, j: int, dsub: int) -> Column:
    return F.slice(vec, j * dsub + 1, dsub)


def pq_encode(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    cb: list[list[list[float]]],
) -> DataFrame:
    """(id, codes array<int>) — map-only, shuffle-free at any scale.

    ``codes[j]`` is the 0-based id of the nearest subspace-``j``
    centroid (squared L2, first-minimum tie-break)."""
    m_sub = len(cb)
    dsub = len(cb[0][0])
    cbl = _cb_literal(cb)
    vec = F.col(vec_col)

    def code(j: int) -> Column:
        dists = F.transform(
            F.element_at(cbl, j + 1),
            lambda cent: _l2sq_seq(_sub(vec, j, dsub), cent),
        )
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    return vectors.select(
        F.col(id_col),
        F.array(*[code(j) for j in range(m_sub)]).alias("codes"),
    )


def pq_adc_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    cb: list[list[list[float]]],
    k: int = 10,
) -> DataFrame:
    """ADC top-k per query + exact cosine re-score of the winners.

    ``codes_df`` is :func:`pq_encode` output; ``queries`` holds
    (id, vec) rows.  Each query's (m × k) distance table is computed
    once as an expression and BROADCAST against the corpus codes; the
    approximate distance is a decimal-accumulated sum of m lookups
    (order-free → portable), ranked ascending with id tie-breaks.
    Returns (query_id, neighbor_id, adc_d2, rank, cosine) — cosine is
    the exact re-score on the original float vectors, the touch-few
    second pass of every PQ deployment."""
    from mongo2mysql_spark.functions.vector import cosine_seq

    m_sub = len(cb)
    dsub = len(cb[0][0])
    cbl = _cb_literal(cb)
    qv = F.col(vec_col)

    # NB: a default-arg lambda (`lambda cent, _j=j: ...`) is a trap here —
    # pyspark reads a 2-parameter HOF lambda as (element, index) and binds
    # the second parameter to the array INDEX, shadowing the default.
    def _dtj(j: int) -> Column:
        return F.transform(
            F.element_at(cbl, j + 1),
            lambda cent: _l2sq_seq(_sub(qv, j, dsub), cent),
        )

    dt = F.array(*[_dtj(j) for j in range(m_sub)])
    qd = queries.select(
        F.col(id_col).alias("query_id"),
        dt.alias("__dt"),
    )
    lookups = F.zip_with(
        F.col("codes"), F.col("__dt"), lambda c, row: F.element_at(row, c + 1)
    )
    adc = F.aggregate(
        lookups,
        F.lit(0).cast(_DEC),
        lambda acc, v: (acc + v.cast(_DEC)).cast(_DEC),
    )
    scored = (
        codes_df.join(F.broadcast(qd))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(adc, 6).cast("double").alias("adc_d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("neighbor_id").asc()
    )
    top = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    # re-score on ``vectors`` for BOTH sides (not the query frame the
    # codes were built from): when callers encode NORMALIZED vectors
    # for angular ADC, the cosine must still be computed raw-vs-raw so
    # its fold is bit-identical to the oracle's raw-vector restatement
    return (
        top.join(
            vectors.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv")
            ),
            "neighbor_id",
        )
        .join(
            F.broadcast(
                vectors.join(
                    queries.select(F.col(id_col).alias("query_id")).distinct(),
                    vectors[id_col] == F.col("query_id"),
                ).select("query_id", F.col(vec_col).alias("__qv"))
            ),
            "query_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            "adc_d2",
            F.col("rank").cast("int").alias("rank"),
            cosine_seq(F.col("__qv"), F.col("__nv")).alias("cosine"),
        )
    )

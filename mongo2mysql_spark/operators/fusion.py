"""Hybrid-retrieval rank fusion (extension layer).

Reciprocal Rank Fusion (Cormack, Clarke, Büttcher, SIGIR 2009): fuse
N ranked candidate lists by ``score(d) = Σ_legs 1/(k + rank_leg(d))``
— the standard way a training-data or RAG pipeline combines keyword
(BM25) retrieval with dense (embedding-cosine) retrieval without
score calibration between the legs.

Scale shape: each leg is bounded to its top-L FIRST via
``TakeOrderedAndProject`` (:func:`ranked_topk` — never a global sort
or an unpartitioned window over the corpus), so everything downstream
is L-sized.  The fusion itself is a union + one hash aggregate on the
leg-sized frames — no join at all.

Determinism contract: ranks are exact integers with id tie-breaks;
``1/(k+rank)`` is a single IEEE double division, summed left-to-right
in leg order and rounded in decimal domain — bit-identical in the
DuckDB oracle restatement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ranked_topk(
    df: DataFrame,
    id_col: str,
    score_col: str,
    depth: int,
) -> DataFrame:
    """(id, rank) for the ``depth`` best rows — rank 1 = highest score,
    id ascending on ties.

    The corpus-sized work is the ``orderBy().limit()`` —
    TakeOrderedAndProject, a per-partition heap + driver-side merge of
    ``depth`` rows per partition.  Ranks are then assigned INSIDE one
    aggregate over the depth-bounded set (sort_array + posexplode):
    a row_number window with no partition spec would plan the
    single-reducer shape the registry sweep bans, even though the
    input here is already L rows."""
    lim = df.orderBy(F.col(score_col).desc(), F.col(id_col).asc()).limit(depth)
    # struct sorts ascending field-by-field: negated score ⇒ score
    # descending (IEEE sign flip is exact), then id ascending
    s = F.struct(
        (F.col(score_col) * F.lit(-1.0)).alias("__k"),
        F.col(id_col).alias("__id"),
    )
    arr = lim.select(s.alias("__s")).agg(
        F.sort_array(F.collect_list("__s")).alias("__a")
    )
    return arr.select(F.posexplode("__a").alias("__pos", "__e")).select(
        F.col("__e.__id").alias(id_col),
        (F.col("__pos") + 1).cast("int").alias("rank"),
    )


def rrf_fuse(
    legs: dict[str, DataFrame],
    id_col: str = "doc_id",
    k: int = 60,
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse ranked legs into (id, <leg>_rank ..., rrf_score).

    Each leg frame holds (``id_col``, ``rank_col``) for its top-L
    candidates; documents absent from a leg contribute nothing for it.
    Implemented as a union + one hash aggregate (max-of-tagged-rank per
    leg) — a full-outer join would refuse broadcast and plan a
    sort-merge join even on L-row inputs.  ``rrf_score`` is rounded to
    9 decimals in decimal domain; ties break on id downstream.
    """
    names = list(legs)
    parts: DataFrame | None = None
    for name, df in legs.items():
        p = df.select(
            F.col(id_col),
            F.lit(name).alias("__leg"),
            F.col(rank_col).cast("int").alias("__r"),
        )
        parts = p if parts is None else parts.unionByName(p)
    assert parts is not None, "rrf_fuse needs at least one leg"
    fused = parts.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("__leg") == n, F.col("__r"))).alias(f"{n}_rank")
            for n in names
        ]
    )
    score: Column | None = None
    for name in names:
        term = F.coalesce(
            F.lit(1.0) / (F.lit(k) + F.col(f"{name}_rank")), F.lit(0.0)
        )
        score = term if score is None else score + term
    return fused.select(
        id_col,
        *[F.col(f"{n}_rank") for n in names],
        F.round(score.cast("decimal(20,12)"), 9)
        .cast("double")
        .alias("rrf_score"),
    )


def sql_rrf_term(rank_expr: str, k: int = 60) -> str:
    """DuckDB mirror of one leg's contribution (explicit DOUBLE: a bare
    ``1.0`` literal is DECIMAL in DuckDB and would divide in decimal
    domain, diverging from Spark's double division)."""
    return f"COALESCE(CAST(1.0 AS DOUBLE) / ({k} + {rank_expr}), CAST(0.0 AS DOUBLE))"

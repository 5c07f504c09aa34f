"""Hybrid-retrieval rank fusion (extension layer).

Reciprocal Rank Fusion (Cormack, Clarke, Büttcher, SIGIR 2009): fuse
N ranked candidate lists by ``score(d) = Σ_legs 1/(k + rank_leg(d))``
— the standard way a training-data or RAG pipeline combines keyword
(BM25) retrieval with dense (embedding-cosine) retrieval without
score calibration between the legs.

Scale shape: each leg is already a top-L list (L driver-bounded —
produced by TakeOrderedAndProject, never a global sort), so the fusion
itself joins tiny frames.  The corpus-sized work happens inside the
legs; RRF adds no shuffle beyond an L-row join per leg.

Determinism contract: ranks are exact integers with id tie-breaks;
``1/(k+rank)`` is a single IEEE double division, summed left-to-right
in leg order and rounded in decimal domain — bit-identical in the
DuckDB oracle restatement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rrf_fuse(
    legs: dict[str, DataFrame],
    id_col: str = "doc_id",
    k: int = 60,
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse ranked legs into (id, <leg>_rank ..., rrf_score).

    Each leg frame holds (``id_col``, ``rank_col``) for its top-L
    candidates; documents absent from a leg contribute nothing for it.
    ``rrf_score`` is rounded to 9 decimals in decimal domain; ties
    break on id downstream.
    """
    out: DataFrame | None = None
    names = list(legs)
    for name, df in legs.items():
        part = df.select(
            F.col(id_col),
            F.col(rank_col).cast("int").alias(f"{name}_rank"),
        )
        out = part if out is None else out.join(part, id_col, "full")
    assert out is not None, "rrf_fuse needs at least one leg"
    score = None
    for name in names:
        term = F.coalesce(
            F.lit(1.0) / (F.lit(k) + F.col(f"{name}_rank")), F.lit(0.0)
        )
        score = term if score is None else score + term
    return out.select(
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

"""UniMax mixing-budget allocation (extension layer).

Chung, Garcia, Roberts et al., "UniMax: Fairer and More Effective
Language Sampling for Large-Scale Multilingual Pretraining" (ICLR
2023): given a total token budget and a per-domain epoch cap, allocate
budget by waterfilling — visit domains smallest-first, give each
``min(e_max · size, remaining_budget / remaining_domains)`` — so small
domains get their full (capped) share before large domains absorb the
rest.  This is the principled alternative to temperature sampling when
over-epoching small domains causes memorization.

Scale shape: the corpus-sized work is ONE aggregation (tokens per
domain); the waterfill itself runs on the D-row domain table — a
bounded driver computation, like IVF calibration.  The result is a
D-row DataFrame joined/broadcast wherever the mixture is applied.

Determinism contract: all arithmetic is integer (floor divisions) —
the DuckDB oracle restates the exact waterfill as a recursive CTE and
every allocation hash-matches bit-for-bit.  Epochs are served as
``epochs_milli = (1000 · alloc) // size`` to stay integer.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def unimax_waterfill(
    sizes: list[tuple[str, int]],
    budget: int,
    e_max: int,
) -> list[tuple[str, int, int, int]]:
    """Pure waterfill over (domain, n_tokens): returns
    (domain, n_tokens, alloc_tokens, epochs_milli), smallest-first
    order with name tie-breaks, exact integer arithmetic."""
    ordered = sorted(sizes, key=lambda kv: (kv[1], kv[0]))
    rem, left = budget, len(ordered)
    out = []
    for name, size in ordered:
        quota = rem // left
        alloc = min(e_max * size, quota)
        rem -= alloc
        left -= 1
        epochs_milli = (1000 * alloc) // size if size > 0 else 0
        out.append((name, size, alloc, epochs_milli))
    return out


def unimax_mixture(
    df: DataFrame,
    domain_col: str,
    token_count: Column,
    budget_frac: Fraction = Fraction(1, 2),
    e_max: int = 2,
) -> DataFrame:
    """(domain, n_tokens, alloc_tokens, epochs_milli) for every domain.

    ``token_count`` is a per-row token-count expression; the budget is
    ``⌊total_tokens · budget_frac⌋``.  The groupBy is the only
    corpus-sized pass; the collect is D-row bounded (domains, not
    documents)."""
    counts = (
        df.groupBy(F.col(domain_col).alias("domain"))
        .agg(F.sum(token_count).cast("long").alias("n_tokens"))
        .collect()
    )
    sizes = [(r["domain"], int(r["n_tokens"])) for r in counts]
    total = sum(n for _, n in sizes)
    budget = total * budget_frac.numerator // budget_frac.denominator
    rows = unimax_waterfill(sizes, budget, e_max)
    spark = df.sparkSession
    return spark.createDataFrame(
        rows, f"{domain_col} string, n_tokens long, alloc_tokens long, epochs_milli long"
    )

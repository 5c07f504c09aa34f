"""Scalar/aggregate expression helpers shared by the query surface.

``dsum``/``davg`` exist for cross-engine determinism: a double sum's low
bits depend on partition order (Spark) vs. sequential scan order
(DuckDB).  Summing in DECIMAL(30,10) is exact and associative, so both
engines produce the identical value; the final cast back to DOUBLE is
then bit-identical.  Cost at scale: decimal aggregation stays inside
whole-stage codegen (no UDF), ~2× the cycles of a double sum — an
acceptable price for a verifiable engine; callers that don't need
bit-parity can use plain ``F.sum``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,10)"


def dmul(a: Column, b: Column) -> Column:
    """Deterministic per-row product: double IEEE multiply (same on any
    engine), then carried into decimal by the caller's dsum."""
    return a.cast("double") * b.cast("double")


def dsum(col: Column) -> Column:
    """Order-independent double sum (exact decimal accumulate → double).

    The exact decimal sum is rounded to scale 4 before the double cast:
    DuckDB converts wide decimals to double via int128 scaling (two
    roundings), Spark via BigDecimal (one correct rounding) — at scale 4
    with |value|·10⁴ < 2⁵³ both paths are exact-then-correctly-rounded,
    so the bits agree across engines.
    """
    return F.round(F.sum(col.cast(DEC)), 4).cast("double")


def davg(col: Column) -> Column:
    """Order-independent double mean: exact decimal sum, double divide."""
    return dsum(col) / F.count(col)


# Oracle-side (DuckDB SQL) equivalents, for building oracle strings.
def sql_dsum(expr: str) -> str:
    return f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(30,10))), 4) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"({sql_dsum(expr)} / COUNT({expr}))"

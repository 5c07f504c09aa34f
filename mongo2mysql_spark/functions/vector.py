"""Vector column expressions over ``array<float>`` embeddings.

Two tiers:

- ``dot_exact`` / ``cosine_exact``: per-element double products folded
  into an exact DECIMAL accumulator — partition/evaluation-order
  independent and bit-identical across engines (the oracle-checkable
  form; same determinism contract as functions/scalar.py).
- ``dot_fast``: plain double fold — what a throughput-critical inner
  loop would use when bit-parity with an external oracle isn't needed.

All are pure column expressions (codegen'd, no UDF); at 100 TB the
similarity operators built on these shuffle only on their blocking keys
(label / LSH bucket / IVF centroid), never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(30,15)"


def _products(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))


def _dec_sum(arr: Column) -> Column:
    return F.aggregate(
        arr,
        F.lit(0).cast(_DEC),
        lambda acc, v: (acc + v.cast(_DEC)).cast(_DEC),
    )


def dot_exact(a: Column, b: Column) -> Column:
    """Exact-decimal dot product → double (order-free, engine-portable)."""
    return _dec_sum(_products(a, b)).cast("double")


def norm_exact(a: Column) -> Column:
    return F.sqrt(_dec_sum(_products(a, a)).cast("double"))


def cosine_exact(a: Column, b: Column, scale: int = 6) -> Column:
    """Cosine similarity rounded to ``scale`` decimals.  The rounding is
    part of the operator contract: downstream thresholds and top-k
    orderings use the rounded value, making results reproducible across
    engines and run-to-run."""
    cos = dot_exact(a, b) / (norm_exact(a) * norm_exact(b))
    return F.round(cos, scale)


def dot_fast(a: Column, b: Column) -> Column:
    """Sequential double fold — fastest pure-expression form."""
    return F.aggregate(
        _products(a, b), F.lit(0.0), lambda acc, v: acc + v
    )

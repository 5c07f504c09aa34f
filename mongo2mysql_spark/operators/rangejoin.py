"""Bucketed range join: points-in-interval without a nested-loop join.

Spark has no native range-join optimization — an inner join on
``start <= point AND point <= end`` plans as BroadcastNestedLoopJoin
(small side) or a cartesian product (both sides big), both of which are
O(|points| x |intervals|) compares.  The standard scale answer (used by
Databricks' range-join hint and by every streaming interval join) is
*bucketing*: quantize the domain into fixed-width buckets, explode each
interval into the buckets it covers, tag each point with its single
bucket, equi-join on the bucket id, then re-check the exact predicate.

Cost model: the equi-join shuffles on ``__bucket`` (hash partitioned,
sort-merge or shuffled-hash — both fine at 100 TB), and each interval is
replicated ``ceil(len / bucket_width) + 1`` times, so pick
``bucket_width`` near the median interval length.  A point lands in
exactly one bucket, so no output dedup is needed — every (point,
interval) match is produced exactly once.

The reference (vanilla/mongo2mysql) has no range join; this is part of
the engine's extension surface (the brief's "operator Spark lacks"
family, alongside operators/asof.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join ``points`` to ``intervals`` where
    ``start_col <= point_col <= end_col`` (inclusive both ends), via a
    bucket equi-join instead of a nested loop.

    ``point_col``/``start_col``/``end_col`` must be integral (cast dates
    to day numbers, timestamps to epoch seconds — the caller owns the
    quantization domain).  ``bucket_width`` is in the same units.
    Column sets must be disjoint (same contract as operators/asof.py —
    enforced, not implied).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"points/intervals columns must be disjoint: {sorted(overlap)}")
    reserved = {"__bucket"} & (set(points.columns) | set(intervals.columns))
    if reserved:
        raise ValueError(f"reserved column name in inputs: {sorted(reserved)}")
    if how != "inner":
        raise ValueError("only inner range joins are supported")

    def bucket_of(c: Column) -> Column:
        # floor-div on longs: correct for negative domains too
        return F.floor(c.cast("long") / F.lit(bucket_width)).cast("long")

    ivl = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(bucket_of(F.col(start_col)), bucket_of(F.col(end_col)))
        ),
    )
    pts = points.withColumn("__bucket", bucket_of(F.col(point_col)))
    exact = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) <= F.col(end_col)
    )
    return pts.join(ivl, on="__bucket", how="inner").filter(exact).drop("__bucket")


def floor_bin_expr(expr: str, width: int) -> str:
    """Exact integer FLOOR division as a SQL expression.  ``DIV``
    truncates toward zero, which would give bin 0 a double width
    spanning (-width, width) — a non-uniform grid for negative
    coordinates that inflates candidate pairs at the zero crossing.
    Pure integer arithmetic (no double division), so it is exact over
    the whole BIGINT domain."""
    return (
        f"(({expr}) DIV {width} - (CASE WHEN ({expr}) % {width} != 0 "
        f"AND ({expr}) < 0 THEN 1 ELSE 0 END))"
    )


def interval_overlap_join_binned(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: int,
) -> DataFrame:
    """Interval × interval OVERLAP join (``l_start <= r_end AND
    l_end >= r_start``, all bounds inclusive) without a nested loop:
    both sides fragment their intervals into aligned integer bins
    (FLOOR(bound / bin_width) — floor, not truncating DIV, so the grid
    stays uniform across the zero crossing), pairs equi-join on the
    bin, the exact
    predicate re-checks, and each true pair is emitted from exactly ONE
    bin — the canonical bin of ``greatest(l_start, r_start)``, which
    both sides provably fragmented into — so no distinct/dedup shuffle
    is ever needed.  The genomics/temporal-database "bin fragmentation"
    technique; Spark would otherwise plan the two-sided inequality as
    BroadcastNestedLoopJoin (quadratic).

    Fragment count per interval is ``len/bin_width + 1`` — size
    ``bin_width`` to the typical interval length.  Column sets must be
    disjoint; bounds must be integral (caller owns the quantization).
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"left/right columns must be disjoint: {sorted(overlap)}")
    if "__bin" in set(left.columns) | set(right.columns):
        raise ValueError("reserved column name in inputs: __bin")

    def bins(lo: str, hi: str) -> Column:
        return F.explode(
            F.sequence(
                F.expr(floor_bin_expr(lo, bin_width)),
                F.expr(floor_bin_expr(hi, bin_width)),
            )
        )

    lb = left.withColumn("__bin", bins(l_start, l_end))
    rb = right.withColumn("__bin", bins(r_start, r_end))
    return (
        lb.join(rb, "__bin")
        .filter(
            (F.col(l_start) <= F.col(r_end)) & (F.col(l_end) >= F.col(r_start))
        )
        .filter(
            F.col("__bin")
            == F.expr(
                floor_bin_expr(f"greatest({l_start}, {r_start})", bin_width)
            )
        )
        .drop("__bin")
    )

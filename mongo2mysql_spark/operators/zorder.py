"""Z-order (Morton) clustering — multi-dimensional data-skipping
layout (extension layer; Morton 1966, the interleaved-key curve
behind multi-dim clustering in production lakehouses and the
UB-tree, Bayer 1997).

Why it matters at 100 TB: engines skip data through per-file min/max
statistics (parquet row-group stats / zone maps — Spark's scans prune
on them automatically).  A LINEAR sort bounds only the leading sort
column per file; any predicate on a second column still reads every
file.  Interleaving the bits of k columns into one Morton key and
range-clustering on it bounds EVERY interleaved column per file, so a
selective predicate on ANY of them prunes — the layout decision is
the scale lever, and this module makes it a first-class, driver-
hashable operator:

- :func:`z_value` is pure integer bit arithmetic (shift/and/or), bit-
  identical in DuckDB, so Morton keys themselves hash cross-engine;
- :func:`z_bucket_stats` emits the per-bucket (count, min/max per
  column) boxes for the z layout AND the linear layout side by side —
  the zone-map geometry both engines can verify;
- :func:`prune_counts` evaluates a rectangular predicate against
  those boxes: how many buckets (files) must be read under each
  layout — the actual skipping win, as exact integers.

Inputs are validated into [0, 2^bits) at plan-build and the interleave
never exceeds 62 bits, so everything stays in BIGINT on both engines.
`cluster_by_z` is the write-side: repartitionByRange on the Morton
key + sortWithinPartitions, which is exactly the layout the stats
rows describe (range partitioner boundaries = bucket boundaries up to
sampling; the stats operator uses fixed-width key ranges so the gate
is deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _guard(c: Column, bits: int, name: str) -> Column:
    return F.when((c >= 0) & (c < (1 << bits)), c).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"z_value: {name} out of [0, 2^{bits}): "),
                c.cast("string"),
            )
        )
    )


def z_value(cols: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of each column (col j's bit b
    lands at position b·n + j) — the Morton key.  n·bits <= 62."""
    n = len(cols)
    if not cols or n * bits > 62:
        raise ValueError(f"need 1..k columns with k*bits <= 62, got "
                         f"{n} x {bits}")
    cs = [_guard(c.cast("long"), bits, f"col{j}")
          for j, c in enumerate(cols)]
    z = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(cs):
            z = z + F.shiftleft(
                F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + j
            )
    return z


def sql_z_value(cols_sql: list[str], bits: int) -> str:
    """DuckDB twin of :func:`z_value` (same shifts, same positions)."""
    n = len(cols_sql)
    if not cols_sql or n * bits > 62:
        raise ValueError("need 1..k columns with k*bits <= 62")
    terms = []
    for b in range(bits):
        for j, c in enumerate(cols_sql):
            terms.append(
                f"(((CAST({c} AS BIGINT) >> {b}) & 1) << {b * n + j})"
            )
    return "(" + " + ".join(terms) + ")"


def cluster_by_z(
    df: DataFrame, cols: list[str], bits: int, n_files: int
) -> DataFrame:
    """The write-side layout: range-partition on the Morton key into
    ``n_files`` partitions and sort within each — every partition's
    min/max box is tight in EVERY interleaved column (what the scan's
    row-group pruning consumes).  Returns the frame ready for
    ``.write.parquet`` with the key dropped."""
    z = z_value([F.col(c) for c in cols], bits).alias("__z")
    return (
        df.select("*", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def z_bucket_stats(
    df: DataFrame, cols: list[str], bits: int, n_buckets: int
) -> DataFrame:
    """Per-bucket zone-map boxes under the z layout AND the linear
    (leading-column sort) layout, side by side — deterministic
    fixed-width key ranges so both engines agree exactly.

    Columns are RANGE-NORMALIZED to ``bits`` bits before interleaving
    (``((c - lo)·2^bits) DIV (hi - lo + 1)`` with data-derived lo/hi —
    the standard z-order recipe; interleaving RAW values with unequal
    domains wastes the top interleave bits on the narrow column's
    constant zeros and degenerates to a coarse linear layout, a
    pitfall this operator's first draft measured).  The reported
    min/max boxes are raw-domain (what a scan's row-group pruning
    consumes).

    Output: (layout, bucket, n, min0, max0, min1, max1) with layout
    in {'z', 'linear'}; z buckets split the normalized Morton key's
    top log2(n_buckets) bits, linear buckets split the LEADING
    column's normalized value the same way."""
    n = len(cols)
    if n != 2:
        raise ValueError("z_bucket_stats compares 2-column layouts")
    if n_buckets < 2 or n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two: {n_buckets}")
    shift = n * bits - (n_buckets - 1).bit_length()
    lshift = bits - (n_buckets - 1).bit_length()
    dom = df.agg(
        F.min(F.col(cols[0]).cast("long")).alias("__lo0"),
        (F.max(F.col(cols[0]).cast("long"))
         - F.min(F.col(cols[0]).cast("long")) + 1).alias("__sp0"),
        F.min(F.col(cols[1]).cast("long")).alias("__lo1"),
        (F.max(F.col(cols[1]).cast("long"))
         - F.min(F.col(cols[1]).cast("long")) + 1).alias("__sp1"),
    )
    base = (
        df.select(
            F.col(cols[0]).cast("long").alias("c0"),
            F.col(cols[1]).cast("long").alias("c1"),
        )
        .crossJoin(F.broadcast(dom))
        .selectExpr(
            "c0", "c1",
            f"((c0 - __lo0) * {1 << bits}) div __sp0 as nc0",
            f"((c1 - __lo1) * {1 << bits}) div __sp1 as nc1",
        )
    )
    z = z_value([F.col("nc0"), F.col("nc1")], bits)
    zb = base.select(
        F.lit("z").alias("layout"),
        F.shiftright(z, shift).cast("long").alias("bucket"),
        "c0", "c1",
    )
    lb = base.select(
        F.lit("linear").alias("layout"),
        F.shiftright(F.col("nc0"), lshift).cast("long").alias("bucket"),
        "c0", "c1",
    )
    return (
        zb.unionByName(lb)
        .groupBy("layout", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c0").alias("min0"),
            F.max("c0").alias("max0"),
            F.min("c1").alias("min1"),
            F.max("c1").alias("max1"),
        )
    )


def sql_z_bucket_stats(
    source_sql: str, cols_sql: list[str], bits: int, n_buckets: int,
    prefix: str = "zb",
) -> str:
    """DuckDB twin of :func:`z_bucket_stats`; ends in
    ``<prefix>stats(layout, bucket, n, min0, max0, min1, max1)``."""
    n = len(cols_sql)
    if n != 2:
        raise ValueError("z_bucket_stats compares 2-column layouts")
    if n_buckets < 2 or n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two: {n_buckets}")
    x = prefix
    shift = n * bits - (n_buckets - 1).bit_length()
    lshift = bits - (n_buckets - 1).bit_length()
    zexpr = sql_z_value(["nc0", "nc1"], bits)
    c0, c1 = cols_sql
    return f"""{x}dom AS (
      SELECT CAST(min({c0}) AS BIGINT) AS lo0,
             CAST(max({c0}) - min({c0}) + 1 AS BIGINT) AS sp0,
             CAST(min({c1}) AS BIGINT) AS lo1,
             CAST(max({c1}) - min({c1}) + 1 AS BIGINT) AS sp1
      FROM {source_sql}),
    {x}base AS (
      SELECT CAST({c0} AS BIGINT) AS c0, CAST({c1} AS BIGINT) AS c1,
             ((CAST({c0} AS BIGINT) - d.lo0) * {1 << bits}) // d.sp0
               AS nc0,
             ((CAST({c1} AS BIGINT) - d.lo1) * {1 << bits}) // d.sp1
               AS nc1
      FROM {source_sql} CROSS JOIN {x}dom d),
    {x}rows AS (
      SELECT 'z' AS layout, ({zexpr} >> {shift}) AS bucket, c0, c1
      FROM {x}base
      UNION ALL
      SELECT 'linear' AS layout, (nc0 >> {lshift}) AS bucket, c0, c1
      FROM {x}base),
    {x}stats AS (
      SELECT layout, bucket, CAST(count(*) AS BIGINT) AS n,
             min(c0) AS min0, max(c0) AS max0,
             min(c1) AS min1, max(c1) AS max1
      FROM {x}rows GROUP BY layout, bucket)"""


def prune_counts(
    stats: DataFrame,
    lo0: int, hi0: int, lo1: int, hi1: int,
) -> DataFrame:
    """Evaluate the rectangular predicate [lo0,hi0]x[lo1,hi1] against
    the zone-map boxes: per layout, how many buckets must be READ
    (box intersects the predicate) and how many rows those buckets
    hold — the skipping win as exact integers."""
    hit = (
        (F.col("max0") >= lo0) & (F.col("min0") <= hi0)
        & (F.col("max1") >= lo1) & (F.col("min1") <= hi1)
    )
    return (
        stats.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(hit.cast("long")).alias("buckets_read"),
            F.sum(F.when(hit, F.col("n")).otherwise(0))
            .cast("long")
            .alias("rows_read"),
        )
    )


def sql_prune_counts(
    stats_cte: str, lo0: int, hi0: int, lo1: int, hi1: int,
    prefix: str = "zp",
) -> str:
    """DuckDB twin of :func:`prune_counts` over ``<stats_cte>``; ends
    in ``<prefix>counts(layout, n_buckets, buckets_read, rows_read)``."""
    x = prefix
    hit = (
        f"(max0 >= {lo0} AND min0 <= {hi0}"
        f" AND max1 >= {lo1} AND min1 <= {hi1})"
    )
    return f"""{x}counts AS (
      SELECT layout, CAST(count(*) AS BIGINT) AS n_buckets,
             CAST(SUM(CASE WHEN {hit} THEN 1 ELSE 0 END) AS BIGINT)
               AS buckets_read,
             CAST(SUM(CASE WHEN {hit} THEN n ELSE 0 END) AS BIGINT)
               AS rows_read
      FROM {stats_cte} GROUP BY layout)"""

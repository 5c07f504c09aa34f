"""Synthetic per-table insertion counter ``_num`` (SURVEY.md §2 A11,
Porter.php:196-201, 260).

The reference increments a per-destination-table counter in cursor
order — 1-based and contiguous, but nondeterministic across runs
because Mongo cursor order is unspecified.  The rebuild orders by an
explicit stable key (default ``_id``) for determinism.

Scale: ``row_number`` over ``partitionBy(_table)`` is one shuffle on
the routing key.  Destination-table cardinality is low and Zipfian, so
AQE skew handling matters; for a single giant table the fallback is the
classic two-phase scheme (per-partition counts → offset cumsum →
partition-local row_number), which avoids putting one table's rows in
a single window partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def add_num(
    df: DataFrame,
    partition_cols: list[str] | None = None,
    order_cols: list[str] | None = None,
    out_col: str = "_num",
) -> DataFrame:
    """Per-group 1-based sequence.  With no partition columns a plain
    window would be a global no-partition window (single reducer on the
    whole table) — that case is routed to the two-phase scheme instead,
    so callers can never accidentally produce a `WindowExec: No
    Partition Defined` plan."""
    if not partition_cols:
        return add_num_two_phase(df, order_cols or ["_id"], out_col=out_col)
    w = W.partitionBy(*partition_cols).orderBy(*(order_cols or ["_id"]))
    return df.withColumn(out_col, F.row_number().over(w))


def add_num_two_phase(
    df: DataFrame, order_cols: list[str] | str, out_col: str = "_num"
) -> DataFrame:
    """Skew-proof global sequence: range-partition on the order key(s),
    count per partition (one tiny job: one row per partition), broadcast
    cumulative offsets, add partition-local rank.  No single-reducer
    window; survives a table with 10^12 rows.  ``order_cols`` must be a
    unique key for the result to be deterministic."""
    from pyspark.sql.functions import spark_partition_id

    if isinstance(order_cols, str):
        order_cols = [order_cols]
    ranged = df.repartitionByRange(*[F.col(c) for c in order_cols])
    with_pid = ranged.withColumn("__pid", spark_partition_id())
    counts = (
        with_pid.groupBy("__pid").count().orderBy("__pid").collect()
    )  # tiny: one row per partition
    offsets = {}
    acc = 0
    for row in counts:
        offsets[row["__pid"]] = acc
        acc += row["count"]
    offset_map = F.create_map(
        *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
    )
    w = W.partitionBy("__pid").orderBy(*order_cols)
    return (
        with_pid.withColumn("__local", F.row_number().over(w))
        .withColumn(out_col, (offset_map[F.col("__pid")] + F.col("__local")).cast("int"))
        .drop("__pid", "__local")
    )

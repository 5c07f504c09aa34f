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
    w = W.partitionBy(*(partition_cols or [])).orderBy(*(order_cols or ["_id"]))
    return df.withColumn(out_col, F.row_number().over(w))


def add_num_two_phase(df: DataFrame, order_col: str, out_col: str = "_num") -> DataFrame:
    """Skew-proof global sequence: sort partitions by range, count per
    partition, broadcast cumulative offsets, add partition-local rank.
    No single-reducer window; survives a table with 10^12 rows."""
    from pyspark.sql.functions import spark_partition_id

    ranged = df.repartitionByRange(F.col(order_col))
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
    w = W.partitionBy("__pid").orderBy(order_col)
    return (
        with_pid.withColumn("__local", F.row_number().over(w))
        .withColumn(out_col, offset_map[F.col("__pid")] + F.col("__local"))
        .drop("__pid", "__local")
    )

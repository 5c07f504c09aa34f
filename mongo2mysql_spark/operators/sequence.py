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


def _prefix_offsets(per_pid: DataFrame, partition_cols: list[str], val_col: str) -> DataFrame:
    """Cumulative offset per group in ``__pid`` order, WITHOUT a window:
    a lit-partitioned window constant-folds back to `WindowExec: No
    Partition Defined`, and an ordered window over the tiny per-pid
    frame would be a needless single-reducer plan shape.  Instead pack
    each group's (pid, value) rows into one sorted array and run a
    linear prefix scan with ``aggregate`` (pure whole-stage-codegen
    expression work on #groups rows).  Returns
    ``partition_cols + (__pid, __offset)`` where ``__offset`` is the
    sum of ``val_col`` over all earlier pids of the same group."""
    packed = per_pid.groupBy(*partition_cols).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("__pid"), F.col(val_col).alias("__v")))
        ).alias("__pc")
    )
    prefix = F.expr(
        """
        aggregate(
          __pc,
          struct(cast(array() as array<struct<__pid:int,__offset:bigint>>) as arr,
                 0L as tot),
          (acc, x) -> struct(
              array_append(acc.arr, struct(x.__pid as __pid, acc.tot as __offset)) as arr,
              acc.tot + x.__v as tot),
          acc -> acc.arr)
        """
    )
    return packed.select(*partition_cols, F.explode(prefix).alias("__o")).select(
        *partition_cols, "__o.__pid", "__o.__offset"
    )


def add_num_two_phase(
    df: DataFrame,
    order_cols: list[str] | str,
    out_col: str = "_num",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-proof sequence: range-partition on (partition_cols +
    order_cols), count per (spark partition × group) — one tiny job,
    #partitions × #groups rows — broadcast cumulative offsets, add
    partition-local rank.  No single-reducer window; survives a table
    (or a group: a routing key with ONE value degenerates a windowed
    ``partitionBy`` into a global window) with 10^12 rows.

    ``order_cols`` must be a unique key within each group for the result
    to be deterministic; ``partition_cols`` values must be non-null
    (the porter's ``_table`` always is).

    Fully LAZY: the per-(partition × group) counts stay a tiny
    DataFrame — cumulative offsets via the `_prefix_offsets` scan,
    broadcast-joined back — rather than a driver collect.  No job runs
    at plan time, and because both branches share the same range
    Exchange, Spark's ReusedExchange computes the shuffle once per
    action."""
    from pyspark.sql.functions import spark_partition_id

    if isinstance(order_cols, str):
        order_cols = [order_cols]
    partition_cols = partition_cols or []
    range_cols = [F.col(c) for c in (*partition_cols, *order_cols)]
    with_pid = df.repartitionByRange(*range_cols).withColumn(
        "__pid", spark_partition_id()
    )
    counts = with_pid.groupBy("__pid", *partition_cols).count()
    offsets = _prefix_offsets(counts, partition_cols, "count")
    w = W.partitionBy("__pid", *partition_cols).orderBy(*order_cols)
    return (
        with_pid.join(F.broadcast(offsets), ["__pid", *partition_cols])
        .withColumn("__local", F.row_number().over(w))
        .withColumn(out_col, (F.col("__offset") + F.col("__local")).cast("int"))
        # the equi-join moves its keys to the front — restore the
        # caller's column order (callers treat this as a withColumn)
        .select(*df.columns, out_col)
    )


def add_running_total_two_phase(
    df: DataFrame,
    value_col: str,
    order_cols: list[str] | str,
    out_col: str = "_cum",
    partition_cols: list[str] | None = None,
    exclusive: bool = False,
) -> DataFrame:
    """Skew-proof global (or per-group) prefix sum of ``value_col`` in
    ``order_cols`` order — the same two-phase shape as
    `add_num_two_phase` (range partition → per-partition sums →
    broadcast offsets → partition-local running sum), generalized from
    counting rows to summing a value.  This is the scale substrate for
    any "position in a global accumulation" operator: sequence packing
    (token budgets), size-bounded file assignment, quota admission.

    ``exclusive=True`` returns the sum over STRICTLY earlier rows
    (0 for the first row) — what packing needs; ``False`` includes the
    current row.  ``value_col`` must be non-negative for packing-style
    uses but the operator itself only needs it non-null."""
    from pyspark.sql.functions import spark_partition_id

    if isinstance(order_cols, str):
        order_cols = [order_cols]
    partition_cols = partition_cols or []
    range_cols = [F.col(c) for c in (*partition_cols, *order_cols)]
    with_pid = df.repartitionByRange(*range_cols).withColumn(
        "__pid", spark_partition_id()
    )
    sums = with_pid.groupBy("__pid", *partition_cols).agg(
        F.sum(F.col(value_col).cast("long")).alias("__s")
    )
    offsets = _prefix_offsets(sums, partition_cols, "__s")
    hi = -1 if exclusive else 0
    w = (
        W.partitionBy("__pid", *partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, hi)
    )
    local = F.coalesce(
        F.sum(F.col(value_col).cast("long")).over(w), F.lit(0).cast("long")
    )
    return (
        with_pid.join(F.broadcast(offsets), ["__pid", *partition_cols])
        .withColumn(out_col, (F.col("__offset") + local).cast("long"))
        .select(*df.columns, out_col)
    )

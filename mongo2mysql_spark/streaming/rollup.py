"""Streaming continuous-aggregate refresh: the hypertable rollup
(operators/rollup.py) fed by Structured Streaming micro-batches.

The batch-side contract is already incremental — ``rollup_partials``
aggregates one ingest batch at finest granularity, ``rollup_merge``
folds it into the partial store at partial (not raw) cardinality, and
``rollup_levels_from_partials`` serves every granularity from the
store.  This module is the last mile: a ``foreachBatch`` sink that
applies exactly that per micro-batch against a parquet-backed store,
so a live event stream maintains hour/day/week aggregates with the raw
history NEVER rescanned — each batch costs one aggregation of the
batch plus one merge at store cardinality.

Store durability: the merged store is written to a fresh directory and
swapped in with two atomic renames (the manifest pattern of
``sources/versioned``), so a crash mid-refresh leaves the previous
store intact and the checkpointed stream replays the batch (REPLACE-
style idempotence: the merge re-runs on the old store).  At cluster
scale with a date-partitioned store, swap the full-store rewrite for
``lake.merge_into_partitioned`` so only the dates a batch touches are
rewritten — late events land in their own bucket's partition.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo2mysql_spark.operators.rollup import rollup_merge, rollup_partials


def read_partial_store(spark, store_dir: str) -> DataFrame | None:
    """Current partial store, or None before the first refresh."""
    current = os.path.join(store_dir, "current")
    if not os.path.isdir(current):
        return None
    return spark.read.parquet(current)


def refresh_partial_store(
    batch_df: DataFrame,
    store_dir: str,
    ts_col: str,
    group_cols: list[str],
    value_col: str,
    finest: str = "hour",
    distinct_col: str | None = None,
) -> None:
    """One incremental refresh: batch → partials → merge → atomic swap."""
    spark = batch_df.sparkSession
    partials = rollup_partials(
        batch_df, ts_col, group_cols, F.col(value_col), finest, distinct_col
    )
    store = read_partial_store(spark, store_dir)
    if store is not None:
        # materialize the read before overwriting its source directory
        store = store.localCheckpoint()
    merged = rollup_merge(store, partials, group_cols)
    os.makedirs(store_dir, exist_ok=True)
    tmp = os.path.join(store_dir, "_incoming")
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.mode("overwrite").parquet(tmp)
    current, old = os.path.join(store_dir, "current"), os.path.join(store_dir, "_old")
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(current):
        os.rename(current, old)
    os.rename(tmp, current)
    shutil.rmtree(old, ignore_errors=True)


def streaming_rollup_refresh(
    stream: DataFrame,
    store_dir: str,
    ts_col: str,
    group_cols: list[str],
    value_col: str,
    finest: str = "hour",
    distinct_col: str | None = None,
    checkpoint_dir: str | None = None,
):
    """Attach the refresh as a foreachBatch sink; returns the started
    StreamingQuery (caller awaits/stops).  With ``availableNow`` the
    same call doubles as a catch-up run over a backlog directory."""

    def handle(batch_df: DataFrame, _epoch: int) -> None:
        refresh_partial_store(
            batch_df, store_dir, ts_col, group_cols, value_col,
            finest, distinct_col,
        )

    writer = stream.writeStream.foreachBatch(handle).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()

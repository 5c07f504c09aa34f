"""Bucketed staging for co-located joins (SURVEY.md §4 scale levers).

A fact-fact join (orders↔lineitem at 100 TB) shuffles BOTH sides on
the key every time it runs.  When the same join key is used repeatedly
— the porter's parent↔child reassembly, iterative dedup pipelines —
the scale lever is to pay the shuffle ONCE: stage both tables bucketed
by the key, after which every subsequent equi-join on that key is
shuffle-free (Spark trusts the bucket layout via the catalog and plans
a SortMergeJoin with zero Exchange).

This is the classic Spark warehouse pattern (``bucketBy`` +
``saveAsTable``); bucket metadata lives in the session catalog, so
bucketed staging requires table names, not bare parquet paths.

Bucket-count guidance at scale: buckets ≈ total_size / 128 MB, and both
sides of a co-located join must use the SAME bucket count (or a
multiple, with ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def stage_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sort-within-bucket)
    catalog table.  Sorting by the join key upgrades later joins from
    shuffle-free to shuffle-AND-sort-free."""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_staged(spark: SparkSession, table: str) -> DataFrame:
    """Read a staged table WITH its bucket metadata (``spark.table``,
    not ``spark.read.parquet`` — a bare path read would discard the
    bucket layout and reintroduce the shuffle)."""
    return spark.table(table)

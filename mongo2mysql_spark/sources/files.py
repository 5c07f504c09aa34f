"""File-format sources beyond parquet: CSV and JSON-lines collections
(SURVEY.md §2 'Scans/sources/sinks' — the reference reads only MongoDB;
a complete engine reads the standard lake formats).

CSV/JSON inference is expensive at 100 TB — both readers take an
explicit schema (or infer from a bounded sample via the dynamic-JSON
path in operators/dynamic.py); production jobs should always pass
``schema=``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None,
    header: bool = True, **options,
) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")  # sample-bounded; avoid in prod
    return reader.option("header", str(header).lower()).csv(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None, **options,
) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None, **options,
) -> DataFrame:
    """ORC collections (self-describing like parquet: predicate pushdown
    and column pruning come from the built-in vectorized reader)."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)

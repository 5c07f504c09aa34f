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


def read_avro(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None, **options,
) -> DataFrame:
    """Avro collections.  Avro is Spark's external-but-official data
    source module (spark-avro); the jar is not in this container, so
    construction is gated with a clear remedy — same pattern as the
    MongoDB connector (sources/mongodb.py): the code path is the
    cluster path, the error is the local path."""
    reader = spark.read.format("avro").options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    try:
        return reader.load(path)
    except Exception as exc:  # pragma: no cover - depends on classpath
        if "Failed to find data source: avro" in str(exc):
            raise RuntimeError(
                "spark-avro not on classpath; add "
                "org.apache.spark:spark-avro_2.13 to spark.jars.packages"
            ) from exc
        raise

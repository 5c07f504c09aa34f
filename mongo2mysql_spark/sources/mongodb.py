"""MongoDB source (reference parity A1/A2 against a live mongod).

The reference reads via a PHP Mongo cursor (Porter.php:140-150).  The
Spark-native equivalent is the public mongo-spark-connector
(``format("mongodb")``) which supports schema inference by sampling,
partitioned reads (one Spark partition per Mongo chunk/split — this is
what makes a 100 TB collection readable by 1000 executors in parallel),
and filter/projection pushdown into the aggregation pipeline.

The connector jar is not present in this container, so construction is
gated: callers get a clear error locally while the same code works on a
cluster with ``--packages org.mongodb.spark:mongo-spark-connector``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def reader_options(
    uri: str,
    database: str,
    collection: str,
    sample_size: int = 1000,
    pipeline: str | None = None,
    partitioner: str | None = None,
    partition_size_mb: int | None = None,
    read_preference: str | None = None,
) -> dict[str, str]:
    """Connector options for one collection read (pure, unit-testable:
    the connector jar itself is absent in the test container).

    The partitioning knobs are the 100 TB levers: ``partitioner``
    selects the split strategy (e.g. the connector's paginate-by-count
    vs sharded-cluster partitioners), ``partition_size_mb`` bounds the
    bytes per Spark input split so 1000 executors each get bounded
    work, and ``read_preference`` routes the scan to secondaries so a
    bulk export doesn't contend with production primaries."""
    opts = {
        "connection.uri": uri,
        "database": database,
        "collection": collection,
        "sampleSize": str(sample_size),
    }
    if pipeline:
        opts["aggregation.pipeline"] = pipeline
    if partitioner:
        opts["partitioner"] = partitioner
    if partition_size_mb is not None:
        opts["partitioner.options.partition.size"] = f"{partition_size_mb}MB"
    if read_preference:
        opts["readPreference.name"] = read_preference
    return opts


def read_collection(
    spark: SparkSession,
    uri: str,
    database: str,
    collection: str,
    sample_size: int = 1000,
    pipeline: str | None = None,
) -> DataFrame:
    """Read one collection. ``pipeline`` is an optional Mongo aggregation
    JSON pushed server-side (the reference's vestigial pushed predicate,
    Porter.php:139 — SURVEY.md §2 A4)."""
    reader = spark.read.format("mongodb").options(
        **reader_options(uri, database, collection, sample_size, pipeline)
    )
    try:
        return reader.load()
    except Exception as exc:  # pragma: no cover - depends on classpath
        raise RuntimeError(
            "mongodb connector not on classpath; add "
            "org.mongodb.spark:mongo-spark-connector to spark.jars.packages "
            "(test harness uses the parquet source instead)"
        ) from exc


def list_collections(uri: str, database: str) -> list[str]:  # pragma: no cover
    """Collection enumeration (A1). Uses pymongo when available."""
    try:
        import pymongo  # type: ignore
    except ImportError as exc:
        raise RuntimeError("pymongo not installed; pass collection names explicitly") from exc
    client = pymongo.MongoClient(uri)
    return sorted(client[database].list_collection_names())

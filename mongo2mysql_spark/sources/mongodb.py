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


def iter_collection_batches(
    collection,
    batch_size: int = 1000,
    resume_from=None,
    max_retries: int = 3,
    sort_field: str = "_id",
):
    """Cursor-batch iteration with resume-after-error (reference parity:
    the ``foreach`` at Porter.php:150 pulls cursor batches from mongod,
    and a long export outlives cursor timeouts / primary stepdowns).

    Yields lists of documents in ascending ``sort_field`` order.  On a
    cursor error mid-iteration the find is RE-ISSUED from the last
    successfully-yielded key (``{sort_field: {"$gt": last}}``), so every
    document is yielded exactly once per key — the same resume contract
    a change-stream resume token gives.  A partially-accumulated batch
    is discarded on error (never yielded), which is what makes the
    exactly-once claim hold.  ``resume_from`` lets a caller continue a
    previous run (e.g. after a process kill) from its last durable key.

    ``max_retries`` bounds CONSECUTIVE failures; any successfully
    yielded batch resets the budget (progress is being made).  Works
    against any pymongo-shaped collection object (``find().sort()
    .batch_size()``); the container has no mongod, so tests drive a
    fake collection with injected mid-cursor failures.

    This is the driver-side fallback/debug path; the scale path stays
    the partitioned connector read (:func:`read_collection`)."""
    last = resume_from
    retries = 0
    while True:
        query = {} if last is None else {sort_field: {"$gt": last}}
        try:
            cursor = (
                collection.find(query).sort(sort_field, 1).batch_size(batch_size)
            )
            batch: list = []
            for doc in cursor:
                batch.append(doc)
                if len(batch) >= batch_size:
                    yield batch
                    last = batch[-1][sort_field]
                    retries = 0
                    batch = []
            if batch:
                yield batch
            return
        except Exception:
            retries += 1
            if retries > max_retries:
                raise


def list_collections(uri: str, database: str) -> list[str]:  # pragma: no cover
    """Collection enumeration (A1). Uses pymongo when available."""
    try:
        import pymongo  # type: ignore
    except ImportError as exc:
        raise RuntimeError("pymongo not installed; pass collection names explicitly") from exc
    client = pymongo.MongoClient(uri)
    return sorted(client[database].list_collection_names())

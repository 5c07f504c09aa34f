"""Online ANN query serving: a stream of query vectors answered per
micro-batch against a FROZEN packed binary-quantization index, results
landing in the crash-safe segment store (extension layer — the
"vector search as a service" loop of production vector stores, on
Structured Streaming).

Shape: the index (a :func:`sign_pack` words frame — the 32× read-cut
BQ layout, built once at ingest) is STATIC; queries arrive as a
stream.  Each micro-batch is (1) one map-only sign-pack of the batch
queries, (2) one Hamming search (XOR+popcount over the packed words,
salted per-query top-k — `operators/similarity._hamming_topk_from_
packed`, the exact plan the batch path uses), (3) one append of the
batch's result rows into the segment store.

The store is the encode-agnostic pq-store (streaming/pqstore.py):
``refresh_pq_store(encode=search)`` — the "encode" stage here IS the
search.  Result rows are keyed by ``query_id:rank``, so merge-on-read
gives LATEST-ANSWER-PER-QUERY semantics for free: re-submitting a
query in a later batch supersedes its earlier rows (same ``max_by``
ordinal resolution, same (writer, epoch) at-least-once replay guard,
same O(batch) append — ingest never reads the result log).

Invariant (driver-hashed via `ann_topk_exact` 'hamserve' +
unit-tested): after any sequence of micro-batches whose queries union
to Q, ``read_ann_results`` equals the one-shot batch
``topk_hamming`` over Q (latest submission per query) — the streaming
serving path is bit-identical to the batch path, ranks, distances and
ids all integer.

At 100 TB: per-batch cost is |batch| packs + one broadcast of the
packed batch against the words scan — queries never shuffle the
corpus; the result append is O(k·|batch|).  The corpus-side words
frame is the stored index (scanned per batch, cacheable); nothing in
the loop grows with history except the result log, which compacts on
the store's scheduled path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo2mysql_spark.operators.similarity import (
    _hamming_topk_from_packed,
    sign_pack,
)
from mongo2mysql_spark.streaming.pqstore import (
    read_pq_store,
    streaming_pq_refresh,
)

_KEY = "qkey"


def _search_stage(
    corpus_packed: DataFrame, id_col: str, vec_col: str, dim: int, k: int
):
    """batch-of-queries -> keyed result rows (the store's 'encode')."""
    n_words = (dim + 31) // 32

    def search(batch: DataFrame) -> DataFrame:
        qp = sign_pack(batch, id_col, vec_col, dim)
        res = _hamming_topk_from_packed(corpus_packed, qp, id_col, n_words, k)
        return res.select(
            F.concat_ws(
                ":", F.col("query_id").cast("string"), F.col("rank").cast("string")
            ).alias(_KEY),
            "query_id",
            "neighbor_id",
            "ham",
            F.col("rank").cast("int").alias("rank"),
        )

    return search


def streaming_ann_serve(
    query_stream: DataFrame,
    store_dir: str,
    corpus_packed: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
    max_deltas: int | None = None,
):
    """Attach the serving loop as a foreachBatch sink; returns the
    started StreamingQuery.  ``corpus_packed`` is the stored BQ index
    (:func:`sign_pack` frame).  Trigger/checkpoint/max_deltas semantics
    are :func:`streaming_pq_refresh`'s (availableNow catch-up by
    default; ``max_deltas`` bounds result-log read amplification)."""
    return streaming_pq_refresh(
        query_stream,
        store_dir,
        _KEY,
        vec_col="",  # unused: the encode hook owns the batch transform
        cb=None,
        checkpoint_dir=checkpoint_dir,
        trigger=trigger,
        encode=_search_stage(corpus_packed, id_col, vec_col, dim, k),
        max_deltas=max_deltas,
    )


def read_ann_results(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """Latest answer set per query: (query_id, neighbor_id, ham, rank)
    resolved last-write-wins per (query, rank) across the segment
    chain, or None before any batch."""
    resolved = read_pq_store(spark, store_dir)
    if resolved is None:
        return None
    return resolved.drop(_KEY)

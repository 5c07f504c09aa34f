"""Streaming Bloom seen-set maintenance: the incremental-ingest shape
of operators/bloom.py.

A production curation pipeline's membership state (benchmark shingles
for decontam, seen content hashes / URL keys for dedup pre-filtering)
grows with every ingest batch.  Because a Bloom filter is the SET of
its bit positions and merge is set union, per-batch maintenance is one
``bloom_build`` over the batch plus one union-distinct against the
store — batch-sized cost, corpus never rescanned (the same contract as
the streaming rollup refresh, whose crash-safe manifest store this
module reuses: immutable ``stores/<id>/`` dirs, one atomic manifest
rename, a ``(writer, epoch)`` guard).

Union is IDEMPOTENT (re-merging a batch changes nothing), so unlike
the additive rollup the epoch guard here is a cost optimization, not a
correctness requirement — an at-least-once replay without it would
still converge to the same filter.  Invariant (tested): any sequence
of per-batch refreshes serves exactly the filter ``bloom_build`` would
produce over the union of all batches.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid

from pyspark.sql import DataFrame

from mongo2mysql_spark.operators.bloom import BLOOM_K, BLOOM_M_BITS, bloom_build
from mongo2mysql_spark.streaming.rollup import _publish_manifest, _read_manifest


def read_bloom_store(spark, store_dir: str) -> DataFrame | None:
    """Current filter (1-column 'pos'), or None before any refresh."""
    manifest = _read_manifest(store_dir)
    if manifest is None:
        return None
    return spark.read.parquet(os.path.join(store_dir, manifest["store"]))


def refresh_bloom_store(
    batch_df: DataFrame,
    store_dir: str,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    writer: str | None = None,
    epoch: int | None = None,
) -> bool:
    """One incremental refresh: batch keys → positions → union with the
    store → immutable dir → atomic manifest publish.  Returns False on
    an already-applied (writer, epoch) replay."""
    spark = batch_df.sparkSession
    manifest = _read_manifest(store_dir)
    if (
        manifest is not None
        and epoch is not None
        and writer is not None
        and manifest.get("writer") == writer
        and manifest.get("last_epoch") is not None
        and epoch <= manifest["last_epoch"]
    ):
        return False
    new = bloom_build(batch_df, key_col, m_bits=m_bits, k=k)
    if manifest is not None:
        old = spark.read.parquet(os.path.join(store_dir, manifest["store"]))
        new = old.unionByName(new).distinct()
    new_rel = os.path.join("stores", uuid.uuid4().hex[:12])
    new.write.parquet(os.path.join(store_dir, new_rel))
    _publish_manifest(
        store_dir,
        {
            "store": new_rel,
            "writer": writer,
            "last_epoch": epoch,
            "previous": manifest["store"] if manifest else None,
        },
    )
    keep = {new_rel.split("/")[-1]}
    if manifest is not None:
        keep.add(manifest["store"].split("/")[-1])
    stores_root = os.path.join(store_dir, "stores")
    for d in os.listdir(stores_root):
        if d not in keep:
            shutil.rmtree(os.path.join(stores_root, d), ignore_errors=True)
    return True


def streaming_bloom_refresh(
    stream: DataFrame,
    store_dir: str,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
):
    """Attach the refresh as a foreachBatch sink; returns the started
    StreamingQuery.  Trigger semantics as streaming_rollup_refresh
    (availableNow catch-up by default, processingTime for live)."""
    writer = (
        hashlib.sha256(os.path.abspath(checkpoint_dir).encode()).hexdigest()[:16]
        if checkpoint_dir
        else None
    )

    def handle(batch_df: DataFrame, epoch: int) -> None:
        refresh_bloom_store(
            batch_df, store_dir, key_col, m_bits, k, writer=writer, epoch=epoch
        )

    writer_q = stream.writeStream.foreachBatch(handle).trigger(
        **(trigger or {"availableNow": True})
    )
    if checkpoint_dir:
        writer_q = writer_q.option("checkpointLocation", checkpoint_dir)
    return writer_q.start()

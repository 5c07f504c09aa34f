"""Streaming PQ code-store maintenance: incremental ANN index ingest.

A deployed IVF-PQ index is append-mostly state: the codebook is FROZEN
at train time (retraining re-encodes the world — a scheduled rebuild,
not an ingest path), while new vectors arrive continuously and need
only encoding + appending.  Per-batch maintenance is one map-only
``pq_encode`` over the batch plus an id-upsert against the store —
batch-sized cost, the existing corpus never re-encoded.  Reuses the
crash-safe manifest store of the streaming rollup (immutable
``stores/<id>/`` dirs, one atomic manifest rename, a ``(writer,
epoch)`` guard).

Unlike the Bloom seen-set's union, the upsert is NOT idempotent across
arbitrary replays of different content, so the epoch guard is a
correctness requirement for at-least-once replays — the same contract
as the additive rollup refresh.  Within a refresh, batch codes REPLACE
any prior codes for re-ingested ids (last-write-wins by id), so
re-publishing a corrected vector converges.

Invariant (tested): any sequence of per-batch refreshes serves exactly
the code table ``pq_encode`` would produce over the union of all
batches (latest version per id) — searches over the store
(``pq_adc_topk``/``pq_ivf_topk`` take it as ``codes_df``) are
indistinguishable from searches over a freshly encoded corpus.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid

from pyspark.sql import DataFrame

from mongo2mysql_spark.operators.pq import pq_encode
from mongo2mysql_spark.streaming.rollup import _publish_manifest, _read_manifest


def read_pq_store(spark, store_dir: str) -> DataFrame | None:
    """Current code table (id, codes), or None before any refresh."""
    manifest = _read_manifest(store_dir)
    if manifest is None:
        return None
    return spark.read.parquet(os.path.join(store_dir, manifest["store"]))


def refresh_pq_store(
    batch_df: DataFrame,
    store_dir: str,
    id_col: str,
    vec_col: str,
    cb: list[list[list[float]]],
    normalize: bool = True,
    writer: str | None = None,
    epoch: int | None = None,
) -> bool:
    """One incremental refresh: batch vectors → codes (map-only encode
    with the frozen codebook) → id-upsert against the store → immutable
    dir → atomic manifest publish.  Returns False on an already-applied
    (writer, epoch) replay."""
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
    new = pq_encode(batch_df, id_col, vec_col, cb, normalize=normalize)
    if manifest is not None:
        old = spark.read.parquet(os.path.join(store_dir, manifest["store"]))
        new = old.join(
            new.select(id_col).distinct(), id_col, "left_anti"
        ).unionByName(new)
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


def streaming_pq_refresh(
    stream: DataFrame,
    store_dir: str,
    id_col: str,
    vec_col: str,
    cb: list[list[list[float]]],
    normalize: bool = True,
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
        refresh_pq_store(
            batch_df, store_dir, id_col, vec_col, cb,
            normalize=normalize, writer=writer, epoch=epoch,
        )

    writer_q = stream.writeStream.foreachBatch(handle).trigger(
        **(trigger or {"availableNow": True})
    )
    if checkpoint_dir:
        writer_q = writer_q.option("checkpointLocation", checkpoint_dir)
    return writer_q.start()

"""Streaming count-min store — the CMS (operators/cms.py) as an
incrementally-maintained frequency service (extension layer — the
reference's 556-LoC ETL core has no streaming surface).

The count-min sketch is the canonical STREAMING summary: its state is
a fixed d×w integer grid and its merge is cell-wise addition, so a
micro-batch pipeline maintains corpus-lifetime frequencies by folding
each batch's grid into a stored grid — O(d·w) work and state per
refresh regardless of batch size, key cardinality, or history.  Point
queries (est >= true, bounded overshoot) then serve without touching
any raw data.  This is the always-on form of the batch 'cms' profiler
branch: the profiler answers "what does this table look like", the
store answers "what has this STREAM looked like since epoch".

Exactness contract: because the fold is integer cell addition, the
stored grid after ANY partition of the input into batches is
bit-identical to the one-shot batch grid — which is exactly what the
registered branch's oracle states (the same Carter-Wegman restatement
the batch branch hashes against; same-answer-different-path across
the STREAMING boundary, the joinview/pqstore gate pattern).

Store mechanics are the house pattern (streaming/rollup.py helpers):
immutable parquet store versions + atomic JSON manifest rename, with
the per-writer (writer, epoch) replay guard — an at-least-once
foreachBatch retry must not double-count a batch's cells.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame

from mongo2mysql_spark.operators.cms import cms_build, cms_merge
from mongo2mysql_spark.streaming.rollup import (
    _publish_manifest,
    _read_manifest,
)


def read_cms_store(spark, store_dir: str) -> DataFrame | None:
    """Current grid (i, bucket, cnt) or None before the first fold."""
    manifest = _read_manifest(store_dir)
    if manifest is None:
        return None
    path = os.path.join(store_dir, manifest["store"], "grid")
    if not os.path.isdir(path):
        return None
    return spark.read.parquet(path)


def refresh_cms_store(
    batch_df: DataFrame,
    store_dir: str,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    writer: str | None = None,
    epoch: int | None = None,
) -> bool:
    """Fold one insert batch into the stored grid.  Returns False on
    an already-applied (writer, epoch) replay (per-writer epoch map —
    the joinview guard).

    Serialization contract (same as joinview.py): refreshes must not
    run concurrently — the manifest read-modify-write is a plain
    read-then-publish, so two concurrent refreshers would each fold
    onto the same base grid and the second publish would silently drop
    the first's delta.  One folding driver per store; replay safety
    (the epoch guard) covers restarts, not concurrency."""
    spark = batch_df.sparkSession
    manifest = _read_manifest(store_dir)
    epochs = dict((manifest or {}).get("epochs") or {})
    if (
        epoch is not None
        and writer is not None
        and epochs.get(writer) is not None
        and epoch <= epochs[writer]
    ):
        return False
    delta = cms_build(batch_df, key_col, depth=depth, width=width)
    old = read_cms_store(spark, store_dir)
    grid = delta if old is None else cms_merge(old, delta)
    new_rel = os.path.join("stores", uuid.uuid4().hex[:12])
    grid.write.parquet(os.path.join(store_dir, new_rel, "grid"))
    # record only real epochs: epochs[writer]=None would make the
    # replay guard never trip for that writer while still mutating
    # the manifest entry
    if writer is not None and epoch is not None:
        epochs[writer] = epoch
    _publish_manifest(
        store_dir,
        {
            "store": new_rel,
            "epochs": epochs,
            "previous": manifest["store"] if manifest else None,
        },
    )
    keep = {new_rel.split("/")[-1]}
    if manifest is not None:
        keep.add(manifest["store"].split("/")[-1])
    stores_root = os.path.join(store_dir, "stores")
    for dname in os.listdir(stores_root):
        if dname not in keep:
            shutil.rmtree(
                os.path.join(stores_root, dname), ignore_errors=True
            )
    return True


def streaming_cms_refresh(
    stream: DataFrame,
    store_dir: str,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    checkpoint_dir: str | None = None,
):
    """availableNow foreachBatch driver: every micro-batch folds its
    grid into the store; writer identity derives from the checkpoint
    dir so distinct streams replay-guard independently."""
    import hashlib

    writer = hashlib.md5(
        (checkpoint_dir or store_dir).encode()
    ).hexdigest()[:12]

    def handle(batch_df: DataFrame, epoch: int) -> None:
        refresh_cms_store(
            batch_df, store_dir, key_col,
            depth=depth, width=width, writer=writer, epoch=epoch,
        )

    writer_q = stream.writeStream.foreachBatch(handle).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer_q = writer_q.option("checkpointLocation", checkpoint_dir)
    return writer_q.start()

"""Streaming priority-sample store — the mergeable priority sketch
(operators/priority.py) as an incrementally-maintained weighted
sample service (extension layer — the reference's 556-LoC ETL core
has no streaming surface).

Priority sampling's state is tiny and mergeable: the top-(k+1) rows
per group by scaled-integer priority (the threshold witness rides
along), and merging a batch's sketch is union + re-top-(k+1) —
O(groups·k) state and work per refresh regardless of batch size or
history.  The store therefore maintains, over an append stream of
documents, a weighted sample that answers unbiased subset-sum
queries ("how many chars does slice X hold so far") without ever
rescanning the stream.

Exactness contract: for APPEND streams (each key arrives once — the
documents case), the stored sketch after ANY partition of the input
into batches is bit-identical to the one-shot sketch of the union
(the containment theorem on priority_sketch), so the finished sample
served from the store hashes against the same DuckDB restatement the
batch branch rides — same-answer-different-path across the streaming
boundary (the cmsstore/joinview/pqstore gate pattern).

Store mechanics are the house pattern: immutable parquet store
versions + atomic JSON manifest rename, per-writer (writer, epoch)
replay guard, same serialization contract as cmsstore (one folding
driver per store; the guard covers restarts, not concurrency).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame

from mongo2mysql_spark.streaming.rollup import (
    _publish_manifest,
    _read_manifest,
)


def read_prio_store(spark, store_dir: str) -> DataFrame | None:
    """Current sketch state (group..., key, w, q) or None before the
    first fold."""
    manifest = _read_manifest(store_dir)
    if manifest is None:
        return None
    path = os.path.join(store_dir, manifest["store"], "sketch")
    if not os.path.isdir(path):
        return None
    return spark.read.parquet(path)


def refresh_prio_store(
    batch_df: DataFrame,
    store_dir: str,
    key_col: str,
    weight_col: str,
    k: int,
    group_cols: list[str] | None = None,
    salt: str = "prio",
    writer: str | None = None,
    epoch: int | None = None,
) -> bool:
    """Fold one append batch into the stored sketch.  Returns False on
    an already-applied (writer, epoch) replay."""
    from mongo2mysql_spark.operators.priority import (
        _priority_ranked,
        priority_sketch,
    )

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
    delta = priority_sketch(
        batch_df, key_col, weight_col, k,
        group_cols=group_cols, salt=salt,
    )
    old = read_prio_store(spark, store_dir)
    sketch = (
        delta if old is None
        else _priority_ranked(
            old.unionByName(delta), k + 1, group_cols or []
        ).drop("prank")
    )
    new_rel = os.path.join("stores", uuid.uuid4().hex[:12])
    sketch.write.parquet(os.path.join(store_dir, new_rel, "sketch"))
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


def prio_store_sample(
    spark, store_dir: str, k: int,
    group_cols: list[str] | None = None,
) -> DataFrame | None:
    """The finished sample (same schema/values as priority_sample of
    everything folded so far) served from the stored sketch alone."""
    from mongo2mysql_spark.operators.priority import _priority_finalize

    sketch = read_prio_store(spark, store_dir)
    if sketch is None:
        return None
    return _priority_finalize(sketch, k, group_cols or [])


def streaming_prio_refresh(
    stream: DataFrame,
    store_dir: str,
    key_col: str,
    weight_col: str,
    k: int,
    group_cols: list[str] | None = None,
    salt: str = "prio",
    checkpoint_dir: str | None = None,
):
    """availableNow foreachBatch driver: every micro-batch folds its
    sketch into the store; writer identity derives from the
    checkpoint dir so distinct streams replay-guard independently."""
    import hashlib

    writer = hashlib.md5(
        (checkpoint_dir or store_dir).encode()
    ).hexdigest()[:12]

    def handle(batch_df: DataFrame, epoch: int) -> None:
        refresh_prio_store(
            batch_df, store_dir, key_col, weight_col, k,
            group_cols=group_cols, salt=salt,
            writer=writer, epoch=epoch,
        )

    writer_q = stream.writeStream.foreachBatch(handle).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer_q = writer_q.option("checkpointLocation", checkpoint_dir)
    return writer_q.start()

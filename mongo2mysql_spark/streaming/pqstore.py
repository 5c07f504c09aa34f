"""Streaming PQ code-store maintenance: incremental ANN index ingest.

A deployed IVF-PQ index is append-mostly state: the codebook is FROZEN
at train time (retraining re-encodes the world — a scheduled rebuild,
not an ingest path), while new vectors arrive continuously and need
only encoding + appending.  Per-batch maintenance is one map-only
``pq_encode`` over the batch written as a NEW DELTA directory — the
store is ``base + ordered deltas`` and a refresh never reads, joins
against, or rewrites existing segments, so ingest I/O is O(batch), not
O(index) (the r6 design read the whole store back and rewrote it per
refresh — a scale-killer for a TB-sized code table).  Reuses the
crash-safe manifest of the streaming rollup (immutable ``stores/<id>/``
dirs, one atomic manifest rename, a ``(writer, epoch)`` guard).

Last-write-wins by id is resolved at READ time (merge-on-read): every
segment carries its manifest ordinal, and ``read_pq_store`` keeps the
row with the highest ordinal per id via one ``max_by`` aggregate —
map-side partials, a single shuffle at store cardinality, paid by the
reader (searches are corpus-sized passes anyway) instead of by every
ingest batch.  ``compact_pq_store`` folds the delta chain back into a
single base segment — the scheduled-maintenance step, bounded like
``streaming/rollup``'s store swap — so read-side resolution cost never
grows without bound.

Unlike the Bloom seen-set's union, the upsert is NOT idempotent across
arbitrary replays of different content, so the epoch guard is a
correctness requirement for at-least-once replays — the same contract
as the additive rollup refresh.  Re-publishing a corrected vector
converges: its delta has a higher ordinal, so reads serve the latest
codes for the id.

Invariant (tested): any sequence of per-batch refreshes serves exactly
the code table ``pq_encode`` would produce over the union of all
batches (latest version per id), before AND after compaction —
searches over the store (``pq_adc_topk``/``pq_ivf_topk`` take it as
``codes_df``) are indistinguishable from searches over a freshly
encoded corpus.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo2mysql_spark.operators.pq import pq_encode
from mongo2mysql_spark.streaming.rollup import _publish_manifest, _read_manifest


def _segments(manifest: dict) -> list[str]:
    """Ordered segment dirs (base first, then deltas oldest→newest)."""
    segs = []
    if manifest.get("base"):
        segs.append(manifest["base"])
    segs.extend(manifest.get("deltas", []))
    return segs


def read_pq_store(spark, store_dir: str) -> DataFrame | None:
    """Current code table (id, codes) resolved last-write-wins by id
    across the segment chain, or None before any refresh.

    One union of narrow (id, codes, ordinal) scans + one ``max_by``
    aggregate — partial-aggregated map-side; no window, no join."""
    manifest = _read_manifest(store_dir)
    if manifest is None:
        return None
    segs = _segments(manifest)
    if not segs:
        return None
    parts = []
    for ordinal, rel in enumerate(segs):
        parts.append(
            spark.read.parquet(os.path.join(store_dir, rel)).withColumn(
                "__seg", F.lit(ordinal)
            )
        )
    allseg = parts[0]
    for p in parts[1:]:
        allseg = allseg.unionByName(p)
    if len(parts) == 1:
        return allseg.drop("__seg")
    id_col = manifest.get("id_col") or allseg.columns[0]
    others = [c for c in allseg.columns if c not in (id_col, "__seg")]
    val = F.struct(*[F.col(c).alias(c) for c in others])
    best = allseg.groupBy(id_col).agg(
        F.max_by(val, F.col("__seg")).alias("__best")
    )
    return best.select(
        id_col, *[F.col(f"__best.{c}").alias(c) for c in others]
    )


def refresh_pq_store(
    batch_df: DataFrame,
    store_dir: str,
    id_col: str,
    vec_col: str,
    cb: list[list[list[float]]],
    normalize: bool = True,
    writer: str | None = None,
    epoch: int | None = None,
    encode=None,
) -> bool:
    """One incremental refresh: batch vectors → codes (map-only encode
    with the frozen codebook) → NEW delta dir → atomic manifest publish.
    Existing segments are never read or rewritten — refresh cost is the
    batch encode plus one manifest rename.  Returns False on an
    already-applied (writer, epoch) replay.

    ``encode`` (optional) swaps the default :func:`pq_encode` for any
    frozen-index-state encode stage ``batch_df -> codes frame keyed by
    id_col`` — e.g. OPQ (``pq_encode(rotate_vectors(batch, R), cb)``)
    or IVFADC residual codes carrying their ``centroid_id``.  The
    store is encode-agnostic: segments, merge-on-read resolution and
    compaction only care about the id key."""
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
    new_rel = os.path.join("stores", uuid.uuid4().hex[:12])
    coded = (
        encode(batch_df)
        if encode is not None
        else pq_encode(batch_df, id_col, vec_col, cb, normalize=normalize)
    )
    coded.write.parquet(os.path.join(store_dir, new_rel))
    _publish_manifest(
        store_dir,
        {
            "base": manifest.get("base") if manifest else None,
            "deltas": (manifest.get("deltas", []) if manifest else []) + [new_rel],
            "id_col": id_col,
            "writer": writer,
            "last_epoch": epoch,
        },
    )
    return True


def compact_pq_store(spark, store_dir: str) -> bool:
    """Fold the segment chain into one resolved base segment — the
    scheduled maintenance step (run when ``len(deltas)`` crosses the
    deployment's read-amplification budget).  Reads the chain ONCE
    through the same merge-on-read resolution, writes one new base,
    publishes atomically; superseded segment dirs are reclaimed, keeping
    the previous chain one cycle for in-flight readers (the rollup
    store's reader contract).  Returns False when there is nothing to
    compact (no manifest or already a lone base)."""
    manifest = _read_manifest(store_dir)
    if manifest is None or len(_segments(manifest)) <= 1:
        return False
    resolved = read_pq_store(spark, store_dir)
    new_rel = os.path.join("stores", uuid.uuid4().hex[:12])
    resolved.write.parquet(os.path.join(store_dir, new_rel))
    _publish_manifest(
        store_dir,
        {
            "base": new_rel,
            "deltas": [],
            "id_col": manifest.get("id_col"),
            "writer": manifest.get("writer"),
            "last_epoch": manifest.get("last_epoch"),
        },
    )
    # reclaim everything except the new base and the chain the previous
    # manifest referenced (readers that resolved it moments earlier)
    keep = {new_rel.split("/")[-1]}
    keep.update(rel.split("/")[-1] for rel in _segments(manifest))
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
    encode=None,
):
    """Attach the refresh as a foreachBatch sink; returns the started
    StreamingQuery.  Trigger semantics as streaming_rollup_refresh
    (availableNow catch-up by default, processingTime for live).
    Compaction is deliberately NOT in the ingest path — schedule
    ``compact_pq_store`` separately.  ``encode`` is threaded through to
    :func:`refresh_pq_store` (OPQ/IVFADC stores)."""
    writer = (
        hashlib.sha256(os.path.abspath(checkpoint_dir).encode()).hexdigest()[:16]
        if checkpoint_dir
        else None
    )

    def handle(batch_df: DataFrame, epoch: int) -> None:
        refresh_pq_store(
            batch_df, store_dir, id_col, vec_col, cb,
            normalize=normalize, writer=writer, epoch=epoch, encode=encode,
        )

    writer_q = stream.writeStream.foreachBatch(handle).trigger(
        **(trigger or {"availableNow": True})
    )
    if checkpoint_dir:
        writer_q = writer_q.option("checkpointLocation", checkpoint_dir)
    return writer_q.start()

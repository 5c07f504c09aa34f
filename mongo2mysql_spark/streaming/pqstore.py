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

import contextlib
import hashlib
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo2mysql_spark.operators.pq import pq_encode
from mongo2mysql_spark.streaming.rollup import _publish_manifest, _read_manifest

_LOCK = "MANIFEST.lock"


@contextlib.contextmanager
def _manifest_lock(store_dir: str, timeout: float = 30.0, stale: float = 120.0):
    """Serialize manifest read-modify-publish across WRITERS (ingest
    refresh vs scheduled compaction — the r7 ADVICE race: a delta
    published between compaction's manifest read and its publish was
    silently dropped AND its dir reclaimed).  O_CREAT|O_EXCL is atomic
    on POSIX and object-store-emulating filesystems; readers never take
    the lock (the manifest rename stays atomic for them).  A lock older
    than ``stale`` seconds is presumed leaked by a crashed holder and
    broken — critical sections here are manifest-sized (milliseconds),
    all heavy I/O happens outside the lock."""
    os.makedirs(store_dir, exist_ok=True)
    path = os.path.join(store_dir, _LOCK)
    deadline = time.monotonic() + timeout
    while True:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            break
        except FileExistsError:
            try:
                if time.time() - os.path.getmtime(path) > stale:
                    os.unlink(path)
                    continue
            except FileNotFoundError:
                continue
            if time.monotonic() > deadline:
                raise TimeoutError(f"pq-store manifest lock busy: {path}")
            time.sleep(0.02)
    try:
        yield
    finally:
        with contextlib.suppress(FileNotFoundError):
            os.unlink(path)


def _base_of(manifest: dict) -> str | None:
    """Base segment, accepting the LEGACY single-dir manifest shape
    (``{"store": rel}`` — the r6 store / streaming-rollup format): a
    pre-existing store must read as its full content and refresh as
    base+delta, not silently as empty (r7 ADVICE: the old reader
    returned [] for it, and the next refresh+compact then deleted the
    orphaned segment — data loss on format migration)."""
    return manifest.get("base") or manifest.get("store")


def _segments(manifest: dict) -> list[str]:
    """Ordered segment dirs (base first, then deltas oldest→newest).
    Raises on an unrecognizable manifest rather than reading it as an
    empty store."""
    if not any(k in manifest for k in ("base", "deltas", "store")):
        raise ValueError(
            f"unrecognized pq-store manifest shape: {sorted(manifest)}"
        )
    segs = []
    base = _base_of(manifest)
    if base:
        segs.append(base)
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
    def _replayed(m: dict | None) -> bool:
        return (
            m is not None
            and epoch is not None
            and writer is not None
            and m.get("writer") == writer
            and m.get("last_epoch") is not None
            and epoch <= m["last_epoch"]
        )

    if _replayed(_read_manifest(store_dir)):
        return False
    new_rel = os.path.join("stores", uuid.uuid4().hex[:12])
    coded = (
        encode(batch_df)
        if encode is not None
        else pq_encode(batch_df, id_col, vec_col, cb, normalize=normalize)
    )
    # heavy I/O (the batch encode + parquet write) happens OUTSIDE the
    # manifest lock; only the read-modify-publish is serialized, so a
    # concurrent compaction can neither drop this delta nor be dropped
    coded.write.parquet(os.path.join(store_dir, new_rel))
    with _manifest_lock(store_dir):
        manifest = _read_manifest(store_dir)
        if _replayed(manifest):
            shutil.rmtree(os.path.join(store_dir, new_rel), ignore_errors=True)
            return False
        _publish_manifest(
            store_dir,
            {
                "base": _base_of(manifest) if manifest else None,
                "deltas": (manifest.get("deltas", []) if manifest else [])
                + [new_rel],
                "retired": manifest.get("retired", []) if manifest else [],
                "id_col": id_col,
                "writer": writer,
                "last_epoch": epoch,
            },
        )
    return True


def compact_pq_store(spark, store_dir: str, _pre_publish=None) -> bool:
    """Fold the segment chain into one resolved base segment — the
    scheduled maintenance step (run when ``len(deltas)`` crosses the
    deployment's read-amplification budget).  Reads the chain ONCE
    through the same merge-on-read resolution and writes one new base
    OUTSIDE the manifest lock, then publishes under the lock against a
    FRESH manifest read:

    - deltas appended by concurrent refreshes since the snapshot are
      carried forward ON TOP of the new base (their ordinals stay
      higher, so merge-on-read still serves them) — the r7 ADVICE race
      where such a delta was silently dropped and deleted is closed;
    - if another compactor won (the base changed), this one discards
      its own output dir and returns False.

    Reclamation is a two-cycle ``retired`` ledger instead of
    ``listdir - keep``: the chain a compaction supersedes is RECORDED
    in the published manifest (kept one full cycle for in-flight
    readers) and only the PREVIOUS cycle's retired dirs — provably
    superseded, referenced by no manifest for a whole cycle — are
    deleted.  A delta dir mid-write by a concurrent refresh (not yet in
    any manifest) is therefore never touched.  Returns False when there
    is nothing to compact (no manifest or already a lone base).

    ``_pre_publish`` is a fault-injection seam for tests (called after
    the new base is written, before the lock is taken)."""
    snapshot = _read_manifest(store_dir)
    if snapshot is None or len(_segments(snapshot)) <= 1:
        return False
    resolved = read_pq_store(spark, store_dir)
    new_rel = os.path.join("stores", uuid.uuid4().hex[:12])
    resolved.write.parquet(os.path.join(store_dir, new_rel))
    if _pre_publish is not None:
        _pre_publish()
    snap_segs = _segments(snapshot)
    with _manifest_lock(store_dir):
        fresh = _read_manifest(store_dir)
        fresh_segs = _segments(fresh) if fresh is not None else []
        if (
            fresh is None
            or _base_of(fresh) != _base_of(snapshot)
            or fresh_segs[: len(snap_segs)] != snap_segs
        ):
            # another compactor republished underneath us: our resolve
            # no longer covers the chain — discard our output, retry
            # is the caller's (scheduler's) business
            shutil.rmtree(os.path.join(store_dir, new_rel), ignore_errors=True)
            return False
        carried = fresh_segs[len(snap_segs):]
        reclaim = fresh.get("retired", [])
        _publish_manifest(
            store_dir,
            {
                "base": new_rel,
                "deltas": carried,
                # the snapshot chain is superseded by new_rel but kept
                # one cycle for readers that resolved it moments ago
                "retired": snap_segs,
                "id_col": fresh.get("id_col"),
                "writer": fresh.get("writer"),
                "last_epoch": fresh.get("last_epoch"),
            },
        )
    for rel in reclaim:
        shutil.rmtree(os.path.join(store_dir, rel), ignore_errors=True)
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
    max_deltas: int | None = None,
):
    """Attach the refresh as a foreachBatch sink; returns the started
    StreamingQuery.  Trigger semantics as streaming_rollup_refresh
    (availableNow catch-up by default, processingTime for live).
    ``encode`` is threaded through to :func:`refresh_pq_store`
    (OPQ/IVFADC stores).

    ``max_deltas`` ENFORCES the read-amplification budget: when a
    refresh leaves more than ``max_deltas`` deltas in the chain, the
    sink runs :func:`compact_pq_store` before the next batch — so
    merge-on-read resolution cost is bounded by ``max_deltas + 1``
    segment scans no matter how long the stream runs.  Leave None to
    schedule compaction externally instead (e.g. off-peak); the
    manifest lock makes either choice safe against concurrent
    refreshes."""
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
        if max_deltas is not None:
            manifest = _read_manifest(store_dir)
            if manifest and len(manifest.get("deltas", [])) > max_deltas:
                compact_pq_store(batch_df.sparkSession, store_dir)

    writer_q = stream.writeStream.foreachBatch(handle).trigger(
        **(trigger or {"availableNow": True})
    )
    if checkpoint_dir:
        writer_q = writer_q.option("checkpointLocation", checkpoint_dir)
    return writer_q.start()

"""Incremental materialized JOIN-aggregate view — aggregate-pushdown
IVM over Structured Streaming micro-batches (extension layer — the
reference's 556-LoC ETL core has no streaming surface).

The Materialize/DBToaster insight applied to the house store shape: a
join-aggregate view

    V(group) = SELECT a.group, count(*), sum(b.value)
               FROM a JOIN b USING (key) GROUP BY a.group

does NOT need either side's history to maintain under inserts.  Push
the aggregate through the join and the state is three KEY-BOUNDED
counter tables (never history-bounded — strictly smaller than the raw
retained inputs a stream-stream join would keep):

    astate(key, group, cnt_a)      bstate(key, cnt_b, sum_bq)
    view(group, n_pairs, pair_sum_q)

and the delta rule for an insert batch on one side is a product of the
batch's own per-key aggregate with the OTHER side's counters:

    side-a batch:  ΔV(group) = Σ_key Δcnt_a · (cnt_b, sum_bq)
    side-b batch:  ΔV(group) = Σ_key cnt_a · (Δcnt_b, Δsum_bq)

Sides may refresh in any interleaving; applying one side at a time is
the two-sided delta rule with the other delta empty, so any replay
order converges to the batch answer (the registered branch's oracle
states the plain batch join-aggregate — the hash proves it).

Per refresh: one map-side-combined aggregate of the batch, one keyed
join against the opposite counter table, three additive full-outer
merges at counter cardinality, one immutable store version + atomic
manifest rename with the same single-writer / (writer, epoch)
at-least-once guard as streaming/rollup.py (helpers shared).  Counts
and the 1e-6-quantized value sums accumulate in exact integers/
DECIMAL(38,0) — order-free partials at any parallelism, so the view
hash-verifies bit-for-bit.  At cluster scale the three tables bucket
by their keys so the merge join is co-located.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo2mysql_spark.streaming.rollup import (
    _publish_manifest,
    _read_manifest,
)

_SCALE = 6


def _merge_additive(
    old: DataFrame | None, delta: DataFrame, keys: list[str], sums: list[str]
) -> DataFrame:
    """Additive full-outer fold of two counter tables (0-coalesced)."""
    if old is None:
        return delta
    o = old.select(keys + [F.col(c).alias(f"__o_{c}") for c in sums])
    d = delta.select(keys + [F.col(c).alias(f"__d_{c}") for c in sums])
    return o.join(d, keys, "full_outer").select(
        *keys,
        *[
            (
                F.coalesce(f"__o_{c}", F.lit(0))
                + F.coalesce(f"__d_{c}", F.lit(0))
            ).alias(c)
            for c in sums
        ],
    )


def _load(spark, store_dir: str, manifest: dict | None, part: str):
    if manifest is None:
        return None
    path = os.path.join(store_dir, manifest["store"], part)
    if not os.path.isdir(path):
        return None
    return spark.read.parquet(path)


def read_join_view(spark, store_dir: str) -> DataFrame | None:
    """Current view table (group, n_pairs, pair_sum_q) or None."""
    return _load(spark, store_dir, _read_manifest(store_dir), "view")


def refresh_join_view(
    batch_df: DataFrame,
    store_dir: str,
    side: str,
    key_col: str,
    group_col: str | None = None,
    value_col: str | None = None,
    writer: str | None = None,
    epoch: int | None = None,
) -> bool:
    """Fold one insert batch of ``side`` ('a' carries ``group_col``,
    'b' carries ``value_col``) into the view store.  Returns False on
    an already-applied (writer, epoch) replay."""
    if side not in ("a", "b"):
        raise ValueError(f"side must be 'a' or 'b', got {side!r}")
    spark = batch_df.sparkSession
    manifest = _read_manifest(store_dir)
    # Per-WRITER replay guard: the two sides of the view are distinct
    # writers (each derives its identity from its own checkpoint dir),
    # so a single (writer, last_epoch) pair fails open when refreshes
    # interleave — A applies epoch N, B commits (manifest now remembers
    # only B), A's retried epoch N would double-apply its delta.  The
    # manifest therefore keeps a {writer: last_epoch} MAP covering every
    # writer ever seen.  Sides must still not refresh CONCURRENTLY: the
    # manifest swap is a read-modify-write (documented contract; a
    # foreachBatch per side serializes naturally because each side's
    # micro-batches are sequential and interleavings between sides are
    # guarded by the map, not by timing).
    epochs = dict((manifest or {}).get("epochs") or {})
    if manifest is not None and not epochs and manifest.get("writer"):
        # legacy single-pair manifests upgrade in place
        epochs = {manifest["writer"]: manifest.get("last_epoch")}
    if (
        epoch is not None
        and writer is not None
        and epochs.get(writer) is not None
        and epoch <= epochs[writer]
    ):
        return False
    astate = _load(spark, store_dir, manifest, "astate")
    bstate = _load(spark, store_dir, manifest, "bstate")
    view = _load(spark, store_dir, manifest, "view")
    dec = "decimal(38,0)"
    if side == "a":
        d = (
            batch_df.select(
                F.col(key_col).alias("key"), F.col(group_col).alias("grp")
            )
            .groupBy("key", "grp")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt_a"))
        )
        if bstate is not None:
            dv = (
                d.join(bstate, "key")
                .groupBy("grp")
                .agg(
                    F.sum(
                        F.col("cnt_a").cast(dec) * F.col("cnt_b").cast(dec)
                    ).cast(dec).alias("n_pairs"),
                    F.sum(
                        F.col("cnt_a").cast(dec) * F.col("sum_bq").cast(dec)
                    ).cast(dec).alias("pair_sum_q"),
                )
            )
            view = _merge_additive(view, dv, ["grp"], ["n_pairs", "pair_sum_q"])
        astate = _merge_additive(astate, d, ["key", "grp"], ["cnt_a"])
    else:
        vq = (
            F.col(value_col).cast(f"decimal(18,{_SCALE})") * 10**_SCALE
        ).cast("long")
        d = (
            batch_df.select(F.col(key_col).alias("key"), vq.alias("vq"))
            .groupBy("key")
            .agg(
                F.count(F.lit(1)).cast("long").alias("cnt_b"),
                F.sum("vq").cast("long").alias("sum_bq"),
            )
        )
        if astate is not None:
            dv = (
                d.join(astate, "key")
                .groupBy("grp")
                .agg(
                    F.sum(
                        F.col("cnt_a").cast(dec) * F.col("cnt_b").cast(dec)
                    ).cast(dec).alias("n_pairs"),
                    F.sum(
                        F.col("cnt_a").cast(dec) * F.col("sum_bq").cast(dec)
                    ).cast(dec).alias("pair_sum_q"),
                )
            )
            view = _merge_additive(view, dv, ["grp"], ["n_pairs", "pair_sum_q"])
        bstate = _merge_additive(bstate, d, ["key"], ["cnt_b", "sum_bq"])
    new_rel = os.path.join("stores", uuid.uuid4().hex[:12])
    base = os.path.join(store_dir, new_rel)
    for name, df in (("astate", astate), ("bstate", bstate), ("view", view)):
        if df is not None:
            # the merges read the OLD version's parquet lazily while the
            # new version is written elsewhere — immutable-dir contract
            df.write.parquet(os.path.join(base, name))
    if writer is not None:
        epochs[writer] = epoch
    _publish_manifest(
        store_dir,
        {
            "store": new_rel,
            "writer": writer,
            "last_epoch": epoch,
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
            shutil.rmtree(os.path.join(stores_root, dname), ignore_errors=True)
    return True


def streaming_join_view_refresh(
    stream: DataFrame,
    store_dir: str,
    side: str,
    key_col: str,
    group_col: str | None = None,
    value_col: str | None = None,
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
):
    """Attach one side's refresh as a foreachBatch sink (availableNow by
    default).  The epoch guard keys on the checkpoint directory — same
    exactly-once split as streaming_rollup_refresh."""
    writer = (
        hashlib.sha256(os.path.abspath(checkpoint_dir).encode()).hexdigest()[:16]
        if checkpoint_dir
        else None
    )

    def handle(batch_df: DataFrame, epoch: int) -> None:
        refresh_join_view(
            batch_df, store_dir, side, key_col, group_col, value_col,
            writer=writer, epoch=epoch,
        )

    writer_q = stream.writeStream.foreachBatch(handle).trigger(
        **(trigger or {"availableNow": True})
    )
    if checkpoint_dir:
        writer_q = writer_q.option("checkpointLocation", checkpoint_dir)
    return writer_q.start()

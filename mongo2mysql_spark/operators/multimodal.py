"""Multimodal column plumbing (extension layer): image/audio/video as
opaque ``binary`` payloads + typed metadata, with decode / feature
extraction as Arrow-batched ``mapInPandas`` stages.

The container has no image/audio libraries, so the decode kernel is a
STUB with two modes:
- ``fake`` (default): a deterministic, dependency-free stand-in that
  derives pseudo-metadata (width/height/n_frames) from the payload
  bytes — making the Spark-side contract (schema, batch iteration,
  partition preservation) fully testable;
- ``real``: raises NotImplementedError at the exact seam where
  PIL/librosa/ffmpeg decoding would plug in on a cluster image.

Scale notes: payloads stay in executor memory only batch-at-a-time
(Arrow ``mapInPandas`` iterator — never a full-partition materialize);
`spark.sql.files.maxPartitionBytes` bounds scan partitions so a 100 TB
binary table streams through fixed-size batches; metadata-only queries
never touch the payload column thanks to parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "media_id long, media_type string, n_bytes long, width int, height int, "
    "n_frames int, checksum string"
)


def payload_frame(df: DataFrame, id_col: Column, payload: Column, media_type: Column) -> DataFrame:
    """Canonical multimodal frame: (media_id, media_type, payload binary,
    n_bytes, checksum).  Metadata is computed as column expressions so
    metadata-only consumers prune the payload at scan time."""
    return df.select(
        id_col.alias("media_id"),
        media_type.alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("checksum"),
    )


def decode_metadata(df: DataFrame, mode: str = "fake") -> DataFrame:
    """Decode/feature-extract stage as ``mapInPandas`` (Arrow batches).

    ``df`` must be a payload_frame.  ``mode='real'`` marks the seam for
    actual media libraries (not present in this container).

    The batch kernel is a fully self-contained closure (stdlib imports
    only, no references to this module's globals) so cloudpickle ships
    it BY VALUE — executors never need this package on their
    ``sys.path``, which a driver-created session does not provide.
    """
    if mode == "real":  # pragma: no cover - cluster-image integration point
        raise NotImplementedError(
            "real media decoding needs PIL/librosa/ffmpeg on the image; "
            "use mode='fake' for plumbing tests"
        )

    def run(batches: Iterator) -> Iterator:
        # deterministic pseudo-decode: metadata derived from payload
        # bytes — stands in for PIL.Image.open / soundfile.read
        import hashlib

        for pdf in batches:
            out = pdf[["media_id", "media_type"]].copy()
            n_bytes, widths, heights, frames, checks = [], [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                h = hashlib.sha256(b).hexdigest()
                n_bytes.append(len(b))
                widths.append(16 + (int(h[:4], 16) % 4080))
                heights.append(16 + (int(h[4:8], 16) % 2144))
                frames.append(1 + (int(h[8:12], 16) % 300))
                checks.append(h)
            out["n_bytes"] = n_bytes
            out["width"] = widths
            out["height"] = heights
            out["n_frames"] = frames
            out["checksum"] = checks
            yield out[
                ["media_id", "media_type", "n_bytes", "width", "height", "n_frames", "checksum"]
            ]

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def sample_frames(df: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sampling plan for video payloads: one output row per
    sampled frame index — pure expression (sequence + explode), the
    actual pixel extraction being part of the decode seam."""
    return df.withColumn(
        "frame_index",
        F.explode(F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_nth))),
    )

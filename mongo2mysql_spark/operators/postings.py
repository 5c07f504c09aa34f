"""Inverted-index storage planning — delta + varint posting-list
compression estimates (extension layer; the reference's 556-LoC ETL
core has no text surface).

Every search engine stores a term's posting list as doc-id GAPS in
varint/group-varint coding (Lucene, Tantivy, the classic IR texts):
sorted ids compress to ~1-2 bytes per posting instead of 8.  This
operator computes, per term, exactly what an index builder's space
planner needs BEFORE building: the posting count (df), the exact
byte cost of delta+varint coding, the plain int64 cost, and the
ratio — the readout that sizes index storage, picks codecs, and
flags terms worth bitmap/roaring treatment instead.

Determinism: byte costs are pure integer arithmetic over exact gaps
(varint length = 1 + [gap>=2^7] + [gap>=2^14] + [gap>=2^21] +
[gap>=2^28]); the served ratio is one IEEE division of exact
integers — everything hashes bit-for-bit against the SQL
restatement.

Scale shape: distinct (token, doc) postings in one exploded pass;
gaps via ``lag`` over the per-token window — partitions are bounded
by each term's document frequency, i.e. by the posting list the
index would materialize anyway.  A stop-word-scale list at 100 TB
shards by (token, id-range) with a per-shard first-gap correction
(the standard segmented-index layout); this single-window form is
the per-segment computation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_VARINT_STEPS = (1 << 7, 1 << 14, 1 << 21, 1 << 28)


def _varint_len(gap: Column) -> Column:
    """Bytes of LEB128 varint for a positive gap < 2^35."""
    out = F.lit(1)
    for step in _VARINT_STEPS:
        out = out + (gap >= F.lit(step)).cast("int")
    return out


def posting_compression(
    docs: DataFrame,
    id_col: str,
    tokens_col: Column,
    k: int = 30,
    shard_span: int | None = None,
) -> DataFrame:
    """Top-``k`` terms by document frequency with exact delta+varint
    byte costs: (token, df, bytes_delta, bytes_plain = 8·df, ratio =
    bytes_delta / bytes_plain).  First gap is ``id + 1`` (ids may be
     0) — the self-delimiting convention a fresh segment writes.
    Top-k orders (df DESC, token): a total order, deterministic cut.

    ``shard_span`` selects the SEGMENTED build — the 100 TB shape a
    stop-word posting list needs: in-shard gaps come from a window
    partitioned by (token, id DIV span) whose partitions are bounded
    by the span (never by a term's df), and shard-boundary gaps are
    reconstructed from a per-(token, shard) min/max aggregate plus
    one lag over the SHARD LIST (bounded by id-domain/span, not by
    postings).  The gap MULTISET is identical to the single-window
    build's — same deltas, same boundary ids — so byte costs are
    bit-equal by construction (unit-tested, and the slot serves this
    path under the unchanged naive-window oracle: the
    same-answer-different-path gate)."""
    from pyspark.sql import Window as W

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if shard_span is not None and shard_span < 1:
        raise ValueError(f"shard_span must be >= 1, got {shard_span}")
    post = (
        docs.select(
            F.col(id_col).alias("id"), F.explode(tokens_col).alias("token")
        )
        .distinct()
    )
    if shard_span is None:
        w = W.partitionBy("token").orderBy("id")
        gaps = post.select(
            "token",
            F.coalesce(
                F.col("id") - F.lag("id").over(w), F.col("id") + F.lit(1)
            ).alias("__gap"),
        )
    else:
        sh = post.withColumn(
            "__s", F.expr(f"id DIV {shard_span}")
        )
        win = W.partitionBy("token", "__s").orderBy("id")
        inner = (
            sh.select(
                "token",
                (F.col("id") - F.lag("id").over(win)).alias("__gap"),
            )
            .filter(F.col("__gap").isNotNull())
        )
        bounds = sh.groupBy("token", "__s").agg(
            F.min("id").alias("__first"), F.max("id").alias("__last")
        )
        wsh = W.partitionBy("token").orderBy("__s")
        boundary = bounds.select(
            "token",
            F.coalesce(
                F.col("__first") - F.lag("__last").over(wsh),
                F.col("__first") + F.lit(1),
            ).alias("__gap"),
        )
        gaps = inner.unionByName(boundary)
    per = (
        gaps.groupBy("token")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum(_varint_len(F.col("__gap")))
            .cast("long")
            .alias("bytes_delta"),
        )
    )
    return (
        per.select(
            "token",
            "df",
            "bytes_delta",
            (F.col("df") * 8).cast("long").alias("bytes_plain"),
            (
                F.col("bytes_delta").cast("double")
                / (F.col("df") * 8).cast("double")
            ).alias("ratio"),
        )
        .orderBy(F.desc("df"), "token")
        .limit(k)
    )


def posting_compression_sql(
    table: str,
    id_col: str,
    tokens_sql: str,
    k: int = 30,
    prefix: str = "pc",
) -> str:
    """DuckDB restatement; final CTE ``<prefix>out(token, df,
    bytes_delta, bytes_plain, ratio)`` — same gap rule, same varint
    step chain."""
    x = prefix
    steps = " + ".join(
        f"CASE WHEN gap >= {s} THEN 1 ELSE 0 END" for s in _VARINT_STEPS
    )
    return f"""{x}post AS (
      SELECT DISTINCT {id_col} AS id, token
      FROM (SELECT {id_col}, unnest({tokens_sql}) AS token FROM {table})),
    {x}gaps AS (
      SELECT token,
             COALESCE(id - lag(id) OVER (PARTITION BY token ORDER BY id),
                      id + 1) AS gap
      FROM {x}post),
    {x}per AS (
      SELECT token,
             CAST(count(*) AS BIGINT) AS df,
             CAST(SUM(1 + {steps}) AS BIGINT) AS bytes_delta
      FROM {x}gaps GROUP BY token),
    {x}out AS (
      SELECT token, df, bytes_delta,
             CAST(df * 8 AS BIGINT) AS bytes_plain,
             CAST(bytes_delta AS DOUBLE) / CAST(df * 8 AS DOUBLE) AS ratio
      FROM {x}per
      ORDER BY df DESC, token LIMIT {k})"""

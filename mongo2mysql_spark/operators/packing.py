"""Sequence packing for LLM training batches (extension layer,
BASELINE.json north star).

Training runs consume fixed-length token sequences, not variable-length
documents: the standard preparation step concatenates the cleaned
corpus in a stable order and slices the token stream into sequences of
exactly ``seq_len`` tokens (documents crossing a boundary are split;
GPT-style "packed" pretraining batches).  The per-document output of
this operator is the document's span in sequence space — which
sequences it lands in and at what offset — which is exactly what a
downstream tokenizer/writer needs to materialize shards, and is also
the auditable answer to "where did this document go?".

Spark shape: token positions are a GLOBAL exclusive prefix sum of
per-document token counts.  A naive window (``Window.orderBy`` with no
partition) is a single-reducer sort of the whole corpus — the exact
plan shape this engine bans (see operators/sequence.py).  The
implementation rides `add_running_total_two_phase`: range partition on
the order key, per-partition sums, broadcast prefix offsets,
partition-local running sum — two small shuffles, no global window, no
driver collect; survives 10^12 documents.

Everything is integer arithmetic (floor-div/mod on BIGINT), so the
result is bit-exact across engines — the DuckDB oracle states the same
cumsum with a window, which is fine at oracle scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo2mysql_spark.operators.sequence import add_running_total_two_phase


def pack_sequences(
    df: DataFrame,
    n_tokens_col: str,
    order_cols: list[str] | str,
    seq_len: int,
    out_prefix: str = "",
) -> DataFrame:
    """Assign every document its span in the packed token stream.

    Adds four columns (``out_prefix``-prefixed):

    - ``first_seq``  — index (0-based) of the sequence where the
      document starts,
    - ``first_offset`` — token offset inside that sequence,
    - ``last_seq``   — index of the sequence where it ends,
    - ``n_seqs``     — number of sequences it touches.

    A zero-token document occupies no tokens; it is reported at its
    boundary position with ``n_seqs = 1`` (span of its insertion
    point).  ``order_cols`` must be a unique total order (e.g. doc_id)
    for determinism.
    """
    p = out_prefix
    cum = "__cum_before"
    out = add_running_total_two_phase(
        df, n_tokens_col, order_cols, out_col=cum, exclusive=True
    )
    n = F.greatest(F.col(n_tokens_col).cast("long"), F.lit(1).cast("long"))
    # integer floor-div throughout (`div`), never a double division —
    # bit-exact at any corpus size
    return (
        out.withColumn("__last_end", F.col(cum) + n - F.lit(1).cast("long"))
        .withColumn(p + "first_seq", F.expr(f"{cum} div {seq_len}"))
        .withColumn(p + "first_offset", F.col(cum) % seq_len)
        .withColumn(p + "last_seq", F.expr(f"__last_end div {seq_len}"))
        .withColumn(
            p + "n_seqs",
            (F.col(p + "last_seq") - F.col(p + "first_seq") + 1).cast("int"),
        )
        .drop(cum, "__last_end")
    )


def pack_manifest(
    packed: DataFrame,
    n_tokens_col: str,
    seq_len: int,
    id_cols: list[str] | str = "doc_id",
) -> DataFrame:
    """Invert the doc→span mapping into the per-sequence manifest a
    training loader reads: one row per (sequence, contributing doc)
    with the exact slice — ``seq_id``, the doc's token range
    [``doc_start``, ``doc_start + n_tok``) and where it lands inside
    the sequence (``seq_offset``).

    ``packed`` is the output of ``pack_sequences`` (needs ``first_seq/
    first_offset/last_seq``).  Plan shape: one ``sequence()`` explode
    (a doc expands to the sequences it touches — bounded by
    doc_len/seq_len + 1 rows) and NO shuffle beyond what a downstream
    ``groupBy(seq_id)`` adds; all arithmetic is integer, bit-exact.
    Zero-token docs are excluded (they occupy no tokens).
    """
    if isinstance(id_cols, str):
        id_cols = [id_cols]
    n = F.col(n_tokens_col).cast("long")
    cum_before = F.col("first_seq") * seq_len + F.col("first_offset")
    exploded = (
        packed.filter(n > 0)
        .withColumn("__cum", cum_before)
        .withColumn(
            "seq_id", F.explode(F.sequence(F.col("first_seq"), F.col("last_seq")))
        )
    )
    seq_start_tok = F.col("seq_id") * seq_len          # global index of seq start
    doc_lo = F.greatest(seq_start_tok, F.col("__cum"))  # slice start, global
    doc_hi = F.least(seq_start_tok + seq_len, F.col("__cum") + n)
    return exploded.select(
        "seq_id",
        *id_cols,
        (doc_lo - F.col("__cum")).alias("doc_start"),
        (doc_hi - doc_lo).cast("int").alias("n_tok"),
        (doc_lo - seq_start_tok).cast("int").alias("seq_offset"),
    )


def _bucket_ladder(max_len: int, min_bucket: int) -> list[int]:
    """Ascending power-of-two bucket sizes, final rung clamped to
    ``max_len`` (which need not be a power of two)."""
    out, b = [], min_bucket
    while b < max_len:
        out.append(b)
        b *= 2
    out.append(max_len)
    return out


def length_buckets(
    df: DataFrame,
    n_tokens_col: str,
    id_col: str,
    max_len: int,
    min_bucket: int = 16,
) -> DataFrame:
    """Length-bucketed batching assignment — the dynamic-batching
    alternative to packing (fine-tuning / inference-serving batches pad
    to a bucket size instead of splitting documents): each document goes
    to the smallest power-of-two bucket ≥ its token count, clamped to
    [``min_bucket``, ``max_len``]; longer documents truncate to
    ``max_len`` with an ``overflow`` flag.  ``pad_tokens`` is the
    per-document padding waste — sum it per bucket and you have the
    padding-vs-packing efficiency ledger every training-data pipeline
    budgets with.

    Scale shape: a PURE narrow projection — the bucket ladder is a
    literal comparison chain (integer-exact on both engines; no log2,
    which would put a transcendental in the hash contract), so bucket
    assignment fuses into the scan at any corpus size.  The per-bucket
    rollup is the caller's one partial-aggregating groupBy."""
    n = F.col(n_tokens_col).cast("int")
    n_eff = F.least(n, F.lit(max_len))
    ladder = _bucket_ladder(max_len, min_bucket)
    bucket = F.coalesce(
        *[F.when(n_eff <= p, F.lit(p)) for p in ladder]
    )
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        bucket.cast("int").alias("bucket_len"),
        (bucket - n_eff).cast("int").alias("pad_tokens"),
        (n > max_len).alias("overflow"),
    )


def sql_length_buckets(n_expr: str, max_len: int, min_bucket: int = 16) -> str:
    """DuckDB mirror of :func:`length_buckets`'s bucket expression —
    the same ladder, single-sourced so both engines restate identical
    thresholds."""
    n_eff = f"LEAST({n_expr}, {max_len})"
    whens = " ".join(
        f"WHEN {n_eff} <= {p} THEN {p}"
        for p in _bucket_ladder(max_len, min_bucket)
    )
    return f"CASE {whens} END"

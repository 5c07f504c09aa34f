"""Document chunking (extension layer): split long documents into
fixed-size token windows with overlap — the step between decode and
embed in every retrieval / training pipeline (a 100k-token document
neither embeds nor trains as one unit; overlapping windows preserve
context across cut points).

Semantics (deterministic, engine-portable):
- chunks start at token positions 1, 1+step, 1+2*step, ... with
  ``step = chunk_tokens - overlap``;
- a chunk is the next ``chunk_tokens`` tokens from its start (the final
  chunk is shorter if the document ends);
- starts beyond ``n - overlap`` are not emitted, so a tail shorter than
  the overlap never becomes its own chunk (it is already fully
  contained in the previous chunk) — except position 1, which always
  emits for any non-empty document;
- empty documents produce no chunks.

Scale shape: tokens are staged as a bound column (see
functions/text.winnow_mins for why a higher-order lambda must slice a
bound column, not an inline expression), then one ``posexplode`` of the
start-position sequence — a narrow row-multiplying projection, no
shuffle, no UDF.  Chunk counts are data-proportional: output rows ≈
total corpus tokens / step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_chunk_tokens, start_token) — one
    row per chunk, whitespace tokenization."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    step = chunk_tokens - overlap
    staged = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__t")
    ).withColumn("__n", F.size(F.col("__t")))
    starts = F.when(
        (F.col("__n") > 0) & ~((F.col("__n") == 1) & (F.element_at("__t", 1) == "")),
        F.sequence(F.lit(1), F.greatest(F.col("__n") - overlap, F.lit(1)), F.lit(step)),
    ).otherwise(F.array().cast("array<int>"))
    return (
        staged.select(
            id_col,
            "__t",
            F.posexplode(starts).alias("chunk_idx", "start_token"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.array_join(
                F.slice(F.col("__t"), F.col("start_token"), chunk_tokens), " "
            ).alias("chunk_text"),
            F.size(
                F.slice(F.col("__t"), F.col("start_token"), chunk_tokens)
            ).alias("n_chunk_tokens"),
            "start_token",
        )
    )

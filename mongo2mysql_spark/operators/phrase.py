"""Positional-index phrase search (extension layer — exact-phrase
retrieval, the capability bag-of-words BM25 gives up: "new york" as a
PHRASE, not two independent terms).

The index shape is positional postings ``(doc, position, token)`` —
what every inverted index stores per occurrence.  A k-term phrase
query starts from the first term's postings and intersects each later
term's postings at the aligned offset (``pos_i = pos_0 + i``): k−1
equi-joins on (doc, position), each keyed on high-cardinality pairs —
the classic positional phrase plan, never a text rescan per query.

Scale shape: postings are built ONCE per corpus (one explode; at
deployment scale they're the stored index, partitioned by token), each
phrase term touches only its own postings slice (a token equality
filter on a narrow stream), and the adjacency joins shuffle on
(doc, pos) — no window, no per-doc collect, no corpus × corpus.  The
driver oracle states the naive per-document scan count, so the hash
proves the index path finds exactly the naive matches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def positional_postings(
    df: DataFrame, id_col: str, toks_col: Column
) -> DataFrame:
    """(id, pos, tok) — 1-based positions, one row per occurrence."""
    return df.select(
        F.col(id_col).alias("id"), F.posexplode(toks_col).alias("pos0", "tok")
    ).select("id", (F.col("pos0") + 1).alias("pos"), "tok")


def phrase_match_counts(
    df: DataFrame,
    id_col: str,
    toks_col: Column,
    phrase: list[str],
    k: int = 20,
) -> DataFrame:
    """Top-k documents containing the exact phrase, with occurrence
    counts: (doc_id, n_hits), ordered by (n_hits DESC, doc_id) — a
    total order, so the cut is deterministic on every engine."""
    if not phrase:
        raise ValueError("phrase must have at least one term")
    postings = positional_postings(df, id_col, toks_col)
    anchors = postings.filter(F.col("tok") == phrase[0]).select("id", "pos")
    for i, term in enumerate(phrase[1:], start=1):
        # distinct names avoid shared-lineage join ambiguity
        nxt = postings.filter(F.col("tok") == term).select(
            F.col("id").alias("__nid"), (F.col("pos") - i).alias("__a")
        )
        anchors = anchors.join(
            nxt,
            (F.col("id") == F.col("__nid")) & (F.col("pos") == F.col("__a")),
        ).select("id", "pos")
    return (
        anchors.groupBy(F.col("id").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .orderBy(F.desc("n_hits"), "doc_id")
        .limit(k)
    )

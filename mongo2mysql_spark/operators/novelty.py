"""Corpus redundancy growth — n-gram novelty per document and
Heaps-law vocabulary growth (extension layer; the reference's 556-LoC
ETL core has no text surface).

Two curation readouts that complement dedup (which asks "is this doc
a copy?") by asking "how much NEW text does each document add?":

- **N-gram novelty** (:func:`ngram_novelty`): for every document, the
  fraction of its distinct n-grams whose FIRST corpus occurrence (by
  ``id_col`` order — ingestion order in a real pipeline) is this
  document.  Low-novelty documents are templated/boilerplate-heavy
  even when no single other document is a near-dup (the failure mode
  MinHash family dedup misses); the per-doc score feeds the same
  keep/drop gates as the quality classifiers.  This is the
  "how much of the dataset is redundant n-grams" measure of the
  dataset-growth literature (e.g. the RefinedWeb/Gopher repetition
  analyses), made relational.
- **Heaps-law growth** (:func:`heaps_growth`): vocabulary size after
  each prefix of the corpus (checkpoints over the id domain) — the
  V(N) ≈ K·N^β curve whose flattening says "more of the same data
  adds no new types" (when to stop crawling a source, whether a
  tokenizer's vocab is saturated).

Scale shape: both reduce to ONE shuffle keyed on the gram/token (the
high-cardinality key), with ``min(id)`` as the first-occurrence
resolver — a map-side-combinable aggregate, no windows, no self-joins,
no ordering of the corpus.  Checkpoint counting is a bounded
(checkpoints × 1) conditional aggregate.  Everything is exact
integers plus one IEEE division per served ratio.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _grams(toks: Column, n: int) -> Column:
    """n-gram strings from a token array (1-based slice semantics
    identical on Spark and DuckDB via transform(sequence)).  Docs
    shorter than ``n`` must short-circuit to an EMPTY array: Spark's
    ``sequence(1, 0)`` counts DOWN ([1, 0]) instead of being empty,
    and ``slice`` at position 0 is a runtime error."""
    if n == 1:
        return toks
    gr = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) >= n, gr).otherwise(
        F.expr("CAST(array() AS array<string>)")
    )


def ngram_novelty(
    docs: DataFrame, id_col: str, tokens_col: Column, n: int = 3
) -> DataFrame:
    """Per-document novelty: (id, n_grams = distinct n-grams in the
    doc, n_novel = those first seen HERE by min-id order, novelty =
    n_novel / n_grams).  Documents shorter than ``n`` tokens emit
    (0, 0, NULL) — no grams, no claim.

    Plan: explode distinct (id, gram) pairs once; ``min(id)`` per gram
    (map-side combined) resolves first occurrences; one join back on
    the gram key; per-doc counts.  Shuffles key on gram then id —
    both high-cardinality.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    pairs = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(_grams(tokens_col, n)).alias("gram"),
        )
        .distinct()
    )
    first = pairs.groupBy("gram").agg(F.min("id").alias("first_id"))
    per_doc = (
        pairs.join(first, "gram")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum((F.col("id") == F.col("first_id")).cast("long"))
            .cast("long")
            .alias("n_novel"),
        )
    )
    base = docs.select(F.col(id_col).alias("id"))
    return base.join(per_doc, "id", "left").select(
        "id",
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        F.when(
            F.coalesce("n_grams", F.lit(0)) > 0,
            F.col("n_novel").cast("double") / F.col("n_grams").cast("double"),
        ).alias("novelty"),
    )


def ngram_novelty_sql(
    table: str, id_col: str, tokens_sql: str, n: int = 3, prefix: str = "nv"
) -> str:
    """DuckDB restatement; final CTE ``<prefix>out(id, n_grams,
    n_novel, novelty)``."""
    x = prefix
    if n == 1:
        grams = tokens_sql
    else:
        grams = (
            f"list_transform(generate_series(1, greatest("
            f"len({tokens_sql}) - {n - 1}, 0)), "
            f"i -> array_to_string(({tokens_sql})[i:i+{n - 1}], ' '))"
        )
    return f"""{x}pairs AS (
      SELECT DISTINCT {id_col} AS id, gram
      FROM (SELECT {id_col}, unnest({grams}) AS gram FROM {table})),
    {x}first AS (
      SELECT gram, min(id) AS first_id FROM {x}pairs GROUP BY gram),
    {x}doc AS (
      SELECT p.id,
             CAST(count(*) AS BIGINT) AS n_grams,
             CAST(SUM(CASE WHEN p.id = f.first_id THEN 1 ELSE 0 END)
               AS BIGINT) AS n_novel
      FROM {x}pairs p JOIN {x}first f USING (gram)
      GROUP BY p.id),
    {x}out AS (
      SELECT b.{id_col} AS id,
             COALESCE(d.n_grams, 0) AS n_grams,
             COALESCE(d.n_novel, 0) AS n_novel,
             CASE WHEN COALESCE(d.n_grams, 0) > 0
                  THEN CAST(d.n_novel AS DOUBLE) / CAST(d.n_grams AS DOUBLE)
             END AS novelty
      FROM {table} b LEFT JOIN {x}doc d ON d.id = b.{id_col})"""


def heaps_growth(
    docs: DataFrame,
    id_col: str,
    tokens_col: Column,
    checkpoints: int = 10,
) -> DataFrame:
    """Vocabulary-growth curve: ``checkpoints`` rows (checkpoint
    1-based, id_max = the id-domain threshold i·max_id/checkpoints,
    tokens_seen = total token occurrences in docs with id <= id_max,
    vocab = distinct tokens first seen at id <= id_max).

    One (token → min id, count partials) aggregate + one bounded
    conditional aggregate per checkpoint — the corpus is scanned once
    and never sorted.
    """
    if checkpoints < 1:
        raise ValueError(f"checkpoints must be >= 1, got {checkpoints}")
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens_col).alias("token")
    )
    per_token = toks.groupBy("token").agg(
        F.min("id").alias("first_id"),
    )
    # per-doc token totals fold separately (occurrences, not types)
    per_doc = toks.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_toks")
    )
    mx = docs.agg(F.max(F.col(id_col)).alias("mx"))
    # threshold via integer DIV on BOTH engines: a double divide +
    # cast would round in DuckDB but truncate in Spark at .5+
    # fractions — integer floor division is bit-identical
    cps = (
        mx.select(
            F.explode(F.sequence(F.lit(1), F.lit(checkpoints))).alias(
                "__i"
            ),
            "mx",
        )
        .select(F.col("__i").cast("int").alias("checkpoint"), "mx")
        .select(
            "checkpoint",
            F.expr(
                f"CAST((mx * CAST(checkpoint AS BIGINT))"
                f" DIV {checkpoints} AS BIGINT)"
            ).alias("id_max"),
        )
    )
    vocab = (
        F.broadcast(cps)
        .join(per_token, F.col("first_id") <= F.col("id_max"))
        .groupBy("checkpoint", "id_max")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    )
    seen = (
        F.broadcast(cps)
        .join(per_doc, F.col("id") <= F.col("id_max"))
        .groupBy("checkpoint", "id_max")
        .agg(F.sum("n_toks").cast("long").alias("tokens_seen"))
    )
    return (
        cps.join(vocab, ["checkpoint", "id_max"], "left")
        .join(seen, ["checkpoint", "id_max"], "left")
        .select(
            "checkpoint",
            "id_max",
            F.coalesce("tokens_seen", F.lit(0)).cast("long").alias(
                "tokens_seen"
            ),
            F.coalesce("vocab", F.lit(0)).cast("long").alias("vocab"),
        )
    )


def heaps_growth_sql(
    table: str,
    id_col: str,
    tokens_sql: str,
    checkpoints: int = 10,
    prefix: str = "hp",
) -> str:
    """DuckDB restatement; final CTE ``<prefix>out(checkpoint, id_max,
    tokens_seen, vocab)``.  Thresholds use integer floor division on
    both engines — a double divide + BIGINT cast would ROUND here but
    TRUNCATE in Spark."""
    x = prefix
    return f"""{x}tok AS (
      SELECT {id_col} AS id, unnest({tokens_sql}) AS token FROM {table}),
    {x}first AS (
      SELECT token, min(id) AS first_id FROM {x}tok GROUP BY token),
    {x}doc AS (
      SELECT id, CAST(count(*) AS BIGINT) AS n_toks
      FROM {x}tok GROUP BY id),
    {x}cps AS (
      SELECT CAST(i AS INTEGER) AS checkpoint,
             CAST((mx * i) // {checkpoints} AS BIGINT) AS id_max
      FROM (SELECT unnest(generate_series(1, {checkpoints})) AS i)
      CROSS JOIN (SELECT max({id_col}) AS mx FROM {table})),
    {x}out AS (
      SELECT c.checkpoint, c.id_max,
             COALESCE((SELECT CAST(SUM(d.n_toks) AS BIGINT) FROM {x}doc d
                       WHERE d.id <= c.id_max), 0) AS tokens_seen,
             COALESCE((SELECT CAST(count(*) AS BIGINT) FROM {x}first f
                       WHERE f.first_id <= c.id_max), 0) AS vocab
      FROM {x}cps c)"""

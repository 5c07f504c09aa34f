"""Cross-document passage-duplicate detection (extension layer —
training-data curation; no reference analogue, the reference's 560 LoC
has no text surface at all).

Document-level dedup (exact hash, MinHash) misses the common web-corpus
failure mode: two DIFFERENT pages sharing a long boilerplate passage —
a license header, a navigation block, a syndicated paragraph.  Training
on them still memorizes the repeated span (Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL 2022, motivates
substring-level dedup).  A full suffix-array pass is not a DataFrame
shape; the scalable relational equivalent is fingerprint co-occurrence:
winnowing guarantees (Schleimer/Wilkerson/Aiken, SIGMOD 2003) that any
shared token run of length >= w+k-1 contributes at least one shared
fingerprint, so documents sharing >= ``min_shared`` fingerprints are
passage-duplicate candidates, ranked by containment.

Scale shape (the part that must survive 100 TB):

- fingerprints are a narrow (doc_id, fp) stream — ~2/(w+1) of shingles
  per doc, computed by pure array expressions (no shuffle, no UDF);
- ubiquitous boilerplate fingerprints (site chrome shared by millions
  of pages) would make the fp-join quadratic in the hottest key; the
  ``max_fp_df`` cap drops any fingerprint appearing in more docs than
  the cap BEFORE the self-join — identical to the shingle-df cap the
  n-gram Jaccard path uses (operators/dedup.py), and sound for
  *pair finding*: a dropped fp only hides pairs already connected by
  thousands of other documents' worth of chrome, which a curation
  pipeline handles as a boilerplate rule, not a pair list;
- the self-join shuffles on fp (bounded fan-out after the cap), the
  pair aggregation shuffles on (doc_a, doc_b) — two shuffles total,
  both on high-cardinality keys.

Determinism: every output column is integer arithmetic except
``containment`` = shared/min(n_a, n_b), an int-over-int IEEE double
division — bit-identical across engines by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo2mysql_spark.functions.text import shingle_hashes, tokens, winnow_mins


def doc_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, w: int = 4
) -> DataFrame:
    """(id, fp) winnowing fingerprint stream, distinct per document."""
    return (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("__t"))
        .select(F.col(id_col), shingle_hashes(F.col("__t"), k).alias("__hs"))
        .select(F.col(id_col), F.explode(winnow_mins(F.col("__hs"), w)).alias("fp"))
    )


def passage_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_fp_df: int | None = 100,
    fps: DataFrame | None = None,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints.

    Returns (doc_a, doc_b, shared_fps, n_a, n_b, containment) with
    doc_a < doc_b; ``containment`` = shared_fps / min(n_a, n_b), the
    fraction of the smaller document's fingerprint set that the pair
    shares (1.0 = one document's passages are fully contained in the
    other).  ``max_fp_df`` drops fingerprints appearing in more than
    that many documents before pairing (boilerplate guard, see module
    docstring); None disables the cap.  Pass ``fps`` (a precomputed
    ``doc_fingerprints``-shaped (id, fp) stream, distinct per doc,
    caller-owned caching) to share one fingerprinting pass across
    several passage operators — the md5 shingle hashing is the
    dominant cost of this family.
    """
    # four consumers below (sizes, the df cap, both join sides) — persist
    # the narrow (id, fp) stream so the md5 shingle arrays are computed
    # once per document, not four times (same pattern as the LSH
    # signature store, operators/dedup.py:161); released after the
    # pair-bounded result materializes (localCheckpoint below), so a
    # long-lived session doesn't accumulate cached blocks per call
    owned = fps is None
    cached = (
        doc_fingerprints(df, id_col, text_col, k, w).persist() if owned else fps
    )
    fps = cached
    sizes = fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_fps"))
    if max_fp_df is not None:
        keep = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("fp_df"))
            .filter(F.col("fp_df") <= max_fp_df)
            .select("fp")
        )
        fps = fps.join(keep, "fp")
    a = fps.select(F.col(id_col).alias("doc_a"), "fp")
    b = fps.select(F.col(id_col).alias("doc_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_fps").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_fps").alias("n_b"))
    out = (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared_fps",
            "n_a",
            "n_b",
            (
                F.col("shared_fps").cast("double")
                / F.least("n_a", "n_b").cast("double")
            ).alias("containment"),
        )
    ).localCheckpoint()
    if owned:
        cached.unpersist()
    return out


def doc_fingerprints_pos(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, w: int = 4
) -> DataFrame:
    """(id, fp, pos) positional winnowing fingerprints.

    Standard winnowing records WHERE each selected hash came from: pos
    is the 0-based token index of the k-shingle whose hash won its
    window (first occurrence on ties — ``array_position`` semantics,
    deterministic).  Distinct per (fp, pos): the same hash selected by
    several overlapping windows emits once per source position it won
    from.  Pure array expressions, no shuffle — the positional twin of
    :func:`doc_fingerprints` for span recovery.
    """
    staged = (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("__t"))
        .select(F.col(id_col), shingle_hashes(F.col("__t"), k).alias("__hs"))
    )
    h = F.col("__hs")
    n = F.size(h)
    anchors = F.transform(
        F.sequence(F.lit(1), F.greatest(n - w + 1, F.lit(1))),
        lambda i: F.struct(
            F.array_min(F.slice(h, i, w)).alias("fp"),
            (F.array_position(F.slice(h, i, w), F.array_min(F.slice(h, i, w)))
             + i - 2).cast("int").alias("pos"),  # 0-based token index
        ),
    )
    sel = F.when(n > 0, F.array_distinct(anchors)).otherwise(
        F.array().cast("array<struct<fp:bigint,pos:int>>")
    )
    return staged.select(
        F.col(id_col), F.explode(sel).alias("__a")
    ).select(id_col, F.col("__a.fp").alias("fp"), F.col("__a.pos").alias("pos"))


def shared_passage_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    min_anchors: int = 2,
    merge_gap: int = 30,
    max_fp_df: int | None = 100,
    pos_fps: DataFrame | None = None,
) -> DataFrame:
    """Locate the duplicated region itself: per candidate pair, the
    merged token spans of doc_a covered by shared fingerprints.

    The substring-dedup step (Lee et al., ACL 2022) needs WHERE the
    shared passage sits so the pipeline can strip the span and keep the
    rest of the document.  Shared-fingerprint positions are exact
    anchors inside the duplicated region (winnowing guarantees one per
    >= w+k-1-token match); anchors within ``merge_gap`` tokens merge
    into one span, spans with >= ``min_anchors`` anchors survive.
    Output: (doc_a, doc_b, a_start, a_end, n_anchors) with [a_start,
    a_end) in doc_a token coordinates (end covers the anchor's full
    k-shingle).  Span edges are approximate to ~±(w+k) tokens — the
    window-min selection samples ~2/(w+1) of shingles.

    Scale shape: same two shuffles as :func:`passage_dup_pairs` (fp,
    then the pair key); the per-pair anchor list is fingerprint-
    bounded, so the merge fold is a small array op, never a window
    over the corpus.
    """
    owned = pos_fps is None
    cached = (
        doc_fingerprints_pos(df, id_col, text_col, k, w).persist()
        if owned
        else pos_fps
    )
    fps = cached
    if max_fp_df is not None:
        keep = (
            fps.groupBy("fp")
            .agg(F.countDistinct(id_col).alias("fp_df"))
            .filter(F.col("fp_df") <= max_fp_df)
            .select("fp")
        )
        fps = fps.join(keep, "fp")
    a = fps.select(F.col(id_col).alias("doc_a"), "fp", F.col("pos").alias("pos_a"))
    b = fps.select(F.col(id_col).alias("doc_b"), "fp")
    anchors = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.array_sort(F.collect_set("pos_a")).alias("ps"))
    )
    # fold sorted anchor positions into (start, end, n) spans
    span = "struct<s:int,e:int,n:int>"
    merged = anchors.select(
        "doc_a",
        "doc_b",
        F.aggregate(
            F.col("ps"),
            F.array().cast(f"array<{span}>"),
            lambda acc, p: F.when(
                (F.size(acc) > 0)
                & (p - F.element_at(acc, -1).getField("e") <= merge_gap),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(
                        F.struct(
                            F.element_at(acc, -1).getField("s").alias("s"),
                            p.alias("e"),
                            (F.element_at(acc, -1).getField("n") + 1).alias("n"),
                        )
                    ),
                ),
            ).otherwise(
                F.concat(
                    acc,
                    F.array(
                        F.struct(p.alias("s"), p.alias("e"), F.lit(1).alias("n"))
                    ),
                )
            ),
        ).alias("spans"),
    )
    out = merged.select(
        "doc_a", "doc_b", F.explode("spans").alias("sp")
    ).select(
        "doc_a",
        "doc_b",
        F.col("sp.s").alias("a_start"),
        (F.col("sp.e") + k).alias("a_end"),  # cover the last anchor's shingle
        F.col("sp.n").alias("n_anchors"),
    )
    # pair-bounded result: materialize it, then release the cached
    # fingerprint stream (no per-call cache leak in long-lived sessions)
    result = out.filter(F.col("n_anchors") >= min_anchors).localCheckpoint()
    if owned:
        cached.unpersist()
    return result


def strip_passage_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str,
    text_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Apply substring-level dedup: remove each pair's shared span from
    the doc_a side (doc_b keeps the corpus's one copy — exactly one
    survivor per duplicated passage, the Lee et al. contract), keep
    every other token.

    ``spans`` is :func:`shared_passage_spans` output; all of a
    document's spans (it may pair with many partners) merge into one
    keep/drop mask evaluated per token — an array ``filter`` with an
    ``exists`` probe over the doc's span list, which is pair-bounded
    and small.  Documents with no spans pass through untouched.  Adds
    ``n_tokens_before`` / ``n_stripped_tokens`` so the pipeline can
    report how much text the pass removed without re-tokenizing.
    """
    out_col = out_col or text_col
    per_doc = spans.groupBy(F.col("doc_a").alias(id_col)).agg(
        F.collect_list(
            F.struct(F.col("a_start").alias("s"), F.col("a_end").alias("e"))
        ).alias("__spans")
    )
    joined = df.join(per_doc, id_col, "left")
    toks = tokens(F.col(text_col))
    sp = F.coalesce(
        F.col("__spans"), F.array().cast("array<struct<s:int,e:int>>")
    )
    kept = F.filter(
        toks,
        lambda x, i: ~F.exists(
            sp, lambda r: (i >= r.getField("s")) & (i < r.getField("e"))
        ),
    )
    return joined.select(
        *[c for c in df.columns if c != text_col],
        F.array_join(kept, " ").alias(out_col),
        F.size(toks).alias("n_tokens_before"),
        (F.size(toks) - F.size(kept)).alias("n_stripped_tokens"),
    )


def self_repetition_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    min_anchors: int = 2,
    merge_gap: int = 20,
    pos_fps: DataFrame | None = None,
) -> DataFrame:
    """Within-document repetition spans: regions that REPEAT earlier
    content of the same document (infinite-scroll pages, templating
    loops, copy-pasted blocks — the remover behind the
    ``top_ngram_fraction`` / ``dup_token_fraction`` detectors).

    A fingerprint selected at several positions of one document marks
    each later occurrence as a repeat anchor (the FIRST occurrence is
    the document's own copy and is never marked); anchors gap-merge
    into (doc_a, doc_b=doc_a, a_start, a_end, n_anchors) spans —
    deliberately the :func:`shared_passage_spans` schema, so
    :func:`strip_passage_spans` applies them unchanged and a pipeline
    can chain cross-document and self-repetition stripping.

    No join at all: one fingerprint pass, one groupBy (id, fp), one
    per-doc merge fold — cheaper than pair finding at any scale.
    ``pos_fps`` (a precomputed :func:`doc_fingerprints_pos` stream,
    caller-owned) shares the fingerprinting pass with sibling passage
    operators.
    """
    fps = (
        doc_fingerprints_pos(df, id_col, text_col, k, w)
        if pos_fps is None
        else pos_fps
    )
    repeats = (
        fps.groupBy(id_col, "fp")
        .agg(F.array_sort(F.collect_set("pos")).alias("ps"))
        .filter(F.size("ps") > 1)
        .select(
            id_col,
            F.explode(F.slice(F.col("ps"), 2, F.greatest(F.size("ps") - 1, F.lit(1))))
            .alias("pos"),
        )
    )
    anchors = repeats.groupBy(id_col).agg(
        F.array_sort(F.collect_set("pos")).alias("ps")
    )
    span = "struct<s:int,e:int,n:int>"
    merged = anchors.select(
        F.col(id_col),
        F.aggregate(
            F.col("ps"),
            F.array().cast(f"array<{span}>"),
            lambda acc, p: F.when(
                (F.size(acc) > 0)
                & (p - F.element_at(acc, -1).getField("e") <= merge_gap),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(
                        F.struct(
                            F.element_at(acc, -1).getField("s").alias("s"),
                            p.alias("e"),
                            (F.element_at(acc, -1).getField("n") + 1).alias("n"),
                        )
                    ),
                ),
            ).otherwise(
                F.concat(
                    acc,
                    F.array(
                        F.struct(p.alias("s"), p.alias("e"), F.lit(1).alias("n"))
                    ),
                )
            ),
        ).alias("spans"),
    )
    return (
        merged.select(F.col(id_col), F.explode("spans").alias("sp"))
        .select(
            F.col(id_col).alias("doc_a"),
            F.col(id_col).alias("doc_b"),
            F.col("sp.s").alias("a_start"),
            (F.col("sp.e") + k).alias("a_end"),
            F.col("sp.n").alias("n_anchors"),
        )
        .filter(F.col("n_anchors") >= min_anchors)
    )


def exact_dup_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
) -> DataFrame:
    """EXACT duplicated-k-gram span marking — the Lee et al. ACL 2022
    ExactSubstr semantic at token-gram granularity, complementing the
    winnowing paths above: winnowing SAMPLES fingerprints (a shared
    run shorter than w+k−1 can be missed), this marks EVERY token
    position covered by a k-gram that occurs more than once in the
    whole corpus (across documents OR within one), then gap-merges
    hits into maximal spans — exactly the spans a substring-dedup
    remover strips.

    Plan: positional k-grams (one narrow pass, pure array exprs) →
    one gram-keyed count (map-side combined; the corpus-scale shuffle
    — the relational stand-in for the suffix array, same join key a
    distributed suffix-array build would shuffle on) → semi-join hits
    back → per-doc gap-merge via ONE lag window (partitions bounded by
    a document's gram count).  All integers.

    Output: one row per document — (id, n_before = token count,
    n_spans, n_dup_tokens = Σ span lengths, n_after = n_before −
    n_dup_tokens, span_min_start, span_max_end); zero-span docs have
    0/0/n_before and NULL bounds.
    """
    from pyspark.sql import Window as W

    from mongo2mysql_spark.operators.novelty import _grams

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("id"), F.size(toks).alias("n_before"),
        _grams(toks, k).alias("__g"),
    )
    pos = base.select(
        "id", F.posexplode("__g").alias("pos", "gram")
    )
    dup = (
        pos.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") > 1)
        .select("gram")
    )
    hits = pos.join(dup, "gram", "left_semi")
    w = W.partitionBy("id").orderBy("pos")
    isl = hits.select(
        "id",
        "pos",
        F.sum(
            (
                F.col("pos") - F.coalesce(F.lag("pos").over(w), F.lit(-k - 1))
                > k
            ).cast("int")
        )
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("island"),
    )
    spans = isl.groupBy("id", "island").agg(
        F.min("pos").alias("s"), F.max("pos").alias("e")
    )
    per_doc = spans.groupBy("id").agg(
        F.count(F.lit(1)).cast("int").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + k).cast("int").alias("n_dup_tokens"),
        F.min("s").cast("int").alias("span_min_start"),
        (F.max("e") + k).cast("int").alias("span_max_end"),
    )
    return base.select("id", "n_before").join(per_doc, "id", "left").select(
        "id",
        F.col("n_before").cast("int").alias("n_before"),
        F.coalesce("n_spans", F.lit(0)).cast("int").alias("n_spans"),
        F.coalesce("n_dup_tokens", F.lit(0)).cast("int").alias(
            "n_dup_tokens"
        ),
        (F.col("n_before") - F.coalesce("n_dup_tokens", F.lit(0)))
        .cast("int")
        .alias("n_after"),
        "span_min_start",
        "span_max_end",
    )


def exact_dup_spans_sql(
    table: str, id_col: str, text_col: str, k: int = 8, prefix: str = "es"
) -> str:
    """DuckDB restatement; final CTE ``<prefix>out(id, n_before,
    n_spans, n_dup_tokens, n_after, span_min_start, span_max_end)``."""
    x = prefix
    return f"""{x}t AS (
      SELECT {id_col} AS id, string_split({text_col}, ' ') AS t
      FROM {table}),
    {x}i AS (
      SELECT id, t,
             unnest(generate_series(1, greatest(len(t) - {k - 1}, 0))) AS i
      FROM {x}t),
    {x}p AS (
      SELECT id, i - 1 AS pos,
             array_to_string(t[i:i+{k - 1}], ' ') AS gram
      FROM {x}i),
    {x}dup AS (SELECT gram FROM {x}p GROUP BY gram HAVING count(*) > 1),
    {x}hit AS (SELECT p.id, p.pos FROM {x}p p JOIN {x}dup USING (gram)),
    {x}isl AS (
      SELECT id, pos,
             SUM(CASE WHEN pos - COALESCE(lag_pos, {-k - 1}) > {k}
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY id ORDER BY pos
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM (SELECT id, pos,
                   lag(pos) OVER (PARTITION BY id ORDER BY pos) AS lag_pos
            FROM {x}hit)),
    {x}sp AS (
      SELECT id, island, MIN(pos) AS s, MAX(pos) AS e
      FROM {x}isl GROUP BY 1, 2),
    {x}doc AS (
      SELECT id,
             CAST(COUNT(*) AS INTEGER) AS n_spans,
             CAST(SUM(e - s + {k}) AS INTEGER) AS n_dup_tokens,
             CAST(MIN(s) AS INTEGER) AS span_min_start,
             CAST(MAX(e) + {k} AS INTEGER) AS span_max_end
      FROM {x}sp GROUP BY 1),
    {x}out AS (
      SELECT b.id,
             CAST(len(b.t) AS INTEGER) AS n_before,
             COALESCE(d.n_spans, 0) AS n_spans,
             COALESCE(d.n_dup_tokens, 0) AS n_dup_tokens,
             CAST(len(b.t) - COALESCE(d.n_dup_tokens, 0) AS INTEGER)
               AS n_after,
             d.span_min_start, d.span_max_end
      FROM {x}t b LEFT JOIN {x}doc d USING (id))"""

"""Deduplication queries (extension layer) with DuckDB oracles.

Hash portability: every signature is built from md5 hex strings —
identical in Spark and DuckDB — so even the LSH candidate sets are
bit-reproducible cross-engine (operators/dedup.py explains why min-of-
md5 is a valid MinHash family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo2mysql_spark.functions.text import tokens, word_shingles
from mongo2mysql_spark.operators.dedup import (
    content_hash,
    dedup_exact,
    embedding_neardup_pairs,
    lsh_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash_bits,
)
from mongo2mysql_spark.queries import register
from mongo2mysql_spark.sources import load_table as T

K = 16
BANDS = 8

# DuckDB 3-token shingle set per doc (mirrors functions/text.word_shingles)
_SHINGLES_CTE = """
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(
               [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]
             )) AS s
      FROM toks WHERE len(t) >= 3)
"""


@register(
    "dedup_exact_hashes",
    """
    SELECT 'token_set' AS method, fingerprint AS hash, doc_id, n_docs FROM (
      SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint,
             min(doc_id) AS doc_id,
             count(*) AS n_docs
      FROM documents
      GROUP BY 1)
    UNION ALL
    SELECT 'sha256' AS method, content_hash AS hash, doc_id, n_docs FROM (
      SELECT sha256(text) AS content_hash,
             min(doc_id) AS doc_id,
             count(*) AS n_docs
      FROM documents
      GROUP BY 1)
    """,
    doc=(
        "exact dedup, both hash bases in one result: token-set fingerprint "
        "(order/duplication-insensitive) and raw sha256 content hash, each "
        "with the deterministic min-id representative and group size.  The "
        "sha256 branch goes through the rank-based dedup_exact operator."
    ),
)
def dedup_exact_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongo2mysql_spark.functions.text import fingerprint

    d = T(spark, sf_dir, "documents", fanout=True)
    fp = (
        d.withColumn("fingerprint", fingerprint(tokens(F.col("text"))))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_docs"))
        .select(F.lit("token_set").alias("method"), F.col("fingerprint").alias("hash"),
                "doc_id", "n_docs")
    )
    hashed = d.withColumn("content_hash", content_hash(F.col("text")))
    counts = hashed.groupBy("content_hash").agg(F.count(F.lit(1)).alias("n_docs"))
    ch = (
        dedup_exact(hashed, ["content_hash"], "doc_id")
        .join(counts, "content_hash")
        .select(F.lit("sha256").alias("method"), F.col("content_hash").alias("hash"),
                "doc_id", "n_docs")
    )
    return fp.unionByName(ch)


def _minhash_sig_sql() -> str:
    from mongo2mysql_spark.operators.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    base = "CAST('0x' || substr(md5(s), 1, 12) AS BIGINT)"
    mins = ",\n             ".join(
        f"min(({MINHASH_A[i]} * h + {MINHASH_B[i]}) % {MINHASH_P}) AS mh{i}"
        for i in range(K)
    )
    return f"""
    hashed AS (SELECT doc_id, {base} AS h FROM sh),
    sig AS (
      SELECT doc_id,
             {mins}
      FROM hashed GROUP BY doc_id)
    """


def _band_exprs_sql() -> str:
    r = K // BANDS
    return ", ".join(
        "md5("
        + " || '|' || ".join(f"CAST(mh{b * r + j} AS VARCHAR)" for j in range(r))
        + f") AS band{b}"
        for b in range(BANDS)
    )


def _lsh_pairs_cte() -> str:
    """CTE chain ``banded, cand, pairs`` (requires ``sh`` and ``sig`` in
    scope); ``pairs`` is (id_1, id_2, est_jaccard >= 0.5).  The MinHash
    signature itself has no standalone registry entry: ``pairs`` is a
    deterministic function of the full signatures (est_jaccard compares
    all k minhashes), so a pairs hash-match verifies them transitively."""
    matches = " + ".join(f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(K))
    return f"""
    banded AS (SELECT *, {_band_exprs_sql()} FROM sig),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
      FROM banded a JOIN banded b
        ON a.doc_id < b.doc_id
       AND ({" OR ".join(f"a.band{b} = b.band{b}" for b in range(BANDS))})
    ),
    pairs AS (
      SELECT id_1, id_2, ({matches}) / {float(K)} AS est_jaccard
      FROM cand
      JOIN sig sa ON sa.doc_id = id_1
      JOIN sig sb ON sb.doc_id = id_2
      WHERE ({matches}) / {float(K)} >= 0.5
    )
    """


@register(
    "dedup_minhash_lsh_pairs",
    f"""
    WITH {_SHINGLES_CTE},
    {_minhash_sig_sql()},
    {_lsh_pairs_cte()}
    SELECT id_1, id_2, est_jaccard FROM pairs
    """,
    doc=f"MinHash LSH near-dup candidates ({BANDS} bands × {K // BANDS} rows), est-Jaccard ≥ 0.5.",
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents", fanout=True)
    sig = minhash_signature(d, "doc_id", word_shingles(tokens(F.col("text")), 3), k=K)
    return lsh_candidate_pairs(sig, "doc_id", k=K, bands=BANDS, min_est_jaccard=0.5)


def _simhash_sql(bits: int = 32) -> str:
    hexhi = "('8','9','a','b','c','d','e','f')"
    cols = ",\n         ".join(
        f"CASE WHEN SUM(CASE WHEN substring(h, {j + 1}, 1) IN {hexhi} THEN 1 ELSE -1 END) > 0 "
        f"THEN '1' ELSE '0' END AS b{j}"
        for j in range(bits)
    )
    concat = " || ".join(f"b{j}" for j in range(bits))
    return f"""
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    h AS (SELECT doc_id, md5(tok) AS h FROM t),
    bits AS (SELECT doc_id,
         {cols}
       FROM h GROUP BY doc_id)
    SELECT doc_id, {concat} AS simhash FROM bits
    """


@register(
    "dedup_simhash",
    _simhash_sql(32),
    doc="32-bit SimHash signature per document (md5-nibble weights).",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents", fanout=True)
    return d.select("doc_id", simhash_bits(tokens(F.col("text")), 32).alias("simhash"))


@register(
    "dedup_ngram_jaccard_pairs",
    f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_1, b.doc_id AS id_2, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_1, id_2,
           ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_1
    JOIN sizes sb ON sb.doc_id = id_2
    WHERE ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) >= 0.6
    """,
    doc="exact 3-gram Jaccard near-dup pairs (≥ 0.6) via shingle self-join.",
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents", fanout=True)
    return ngram_jaccard_pairs(
        d, "doc_id", word_shingles(tokens(F.col("text")), 3), min_jaccard=0.6
    )


def _cos_sql(a: str, b: str) -> str:
    from mongo2mysql_spark.functions.vector import sql_dot, sql_norm

    return f"ROUND({sql_dot(a, b)} / ({sql_norm(a)} * {sql_norm(b)}), 6)"


@register(
    "dedup_embedding_cosine_pairs",
    f"""
    WITH scored AS (
      SELECT a.vec_id AS id_1, b.vec_id AS id_2,
             {_cos_sql('a.embedding', 'b.embedding')} AS cosine
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id)
    SELECT id_1, id_2, cosine FROM scored WHERE cosine >= 0.3
    """,
    doc="embedding near-dup pairs: exact-decimal cosine ≥ 0.3 within label blocks.",
)
def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings", fanout=True)
    return embedding_neardup_pairs(e, "vec_id", "embedding", "label", min_cosine=0.3)


@register(
    "dedup_connected_components",
    f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_minhash_sig_sql()},
    {_lsh_pairs_cte()},
    edges AS (
      SELECT id_1 AS a, id_2 AS b FROM pairs
      UNION
      SELECT id_2, id_1 FROM pairs),
    reach(id, r) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id),
    comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
    labeled AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component_id
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
    SELECT doc_id, component_id,
           count(*) OVER (PARTITION BY component_id) AS cluster_size,
           CAST(CASE WHEN doc_id = component_id THEN 1 ELSE 0 END AS INTEGER)
             AS is_representative
    FROM labeled
    """,
    doc=(
        "near-dup cluster resolution: transitive closure of the LSH pair "
        "list via alternating large-star/small-star (operators/components), "
        "every document labeled with its cluster's min doc_id.  The oracle "
        "states the same closure as a recursive CTE."
    ),
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from mongo2mysql_spark.operators.components import connected_components

    d = T(spark, sf_dir, "documents", fanout=True)
    sig = minhash_signature(d, "doc_id", word_shingles(tokens(F.col("text")), 3), k=K)
    pairs = lsh_candidate_pairs(sig, "doc_id", k=K, bands=BANDS, min_est_jaccard=0.5)
    comp = connected_components(pairs, "id_1", "id_2")
    return (
        d.join(comp, d.doc_id == comp.id, "left")
        .select(
            "doc_id", F.coalesce("component", F.col("doc_id")).alias("component_id")
        )
        .withColumn(
            "cluster_size", F.count(F.lit(1)).over(W.partitionBy("component_id"))
        )
        .withColumn(
            "is_representative",
            (F.col("doc_id") == F.col("component_id")).cast("int"),
        )
    )

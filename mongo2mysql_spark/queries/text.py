"""Text-analysis + multimodal queries (extension layer)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo2mysql_spark.functions.text import (
    STOPWORDS,
    lang_guess,
    mean_token_length,
    quality_score,
    stopword_ratio,
    tokens,
)
from mongo2mysql_spark.operators.multimodal import decode_metadata, payload_frame
from mongo2mysql_spark.queries import register
from mongo2mysql_spark.sources import load_table as T


def sql_quality(t: str = "t", text: str = "text") -> str:
    """DuckDB mirror of functions/text.quality_score (shared by the
    standalone quality query and the corpus pipeline oracle)."""
    return f"""ROUND(LEAST(GREATEST(
             0.5 * LEAST(len({t}) / 100.0, 1.0)
             + 0.5 * (CAST(len(list_distinct({t})) AS DOUBLE) / GREATEST(len({t}), 1))
             - (CAST(length(regexp_replace({text}, '[^[:punct:]]', '', 'g')) AS DOUBLE)
                / GREATEST(length({text}), 1)),
             0.0), 1.0), 6)"""


def _sql_lang_hits(lang: str, t: str = "t") -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({t}, x -> list_contains([{words}], x)))"


def sql_lang_guess(t: str = "t") -> str:
    """DuckDB mirror of functions/text.lang_guess."""
    structs = ", ".join(
        f"{{'a': -{_sql_lang_hits(lang, t)}, 'l': '{lang}'}}" for lang in sorted(STOPWORDS)
    )
    return f"list_sort([{structs}])[1].l"


@register(
    "text_token_quality",
    f"""
    SELECT doc_id,
           CAST(len(t) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(t)) AS INTEGER) AS n_unique,
           CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) AS mean_token_len,
           CAST(length(text) AS INTEGER) AS n_chars_actual,
           {sql_quality()} AS quality
    FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
    """,
    doc=(
        "per-document token statistics + quality score in one pass: token/"
        "distinct counts, mean token length, and the length-band + lexical-"
        "diversity − punctuation-noise quality heuristic."
    ),
)
def text_token_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents", fanout=True)
    t = tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_unique"),
        mean_token_length(t).alias("mean_token_len"),
        F.length("text").alias("n_chars_actual"),
        quality_score(t, F.col("text")).alias("quality"),
    )


@register(
    "text_term_frequency",
    """
    SELECT token, n FROM (
      SELECT tok AS token, COUNT(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY 1)
    ORDER BY n DESC, token
    LIMIT 50
    """,
    doc="global term frequency (top 50, deterministic tiebreak).",
)
def text_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents", fanout=True)
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(50)
    )


def _langid_sql() -> str:
    ratios = ",\n           ".join(
        f"CAST({_sql_lang_hits(lang)} AS DOUBLE) / GREATEST(len(t), 1) AS ratio_{lang}"
        for lang in sorted(STOPWORDS)
    )
    return f"""
    SELECT doc_id, lang,
           {ratios},
           {sql_lang_guess()} AS lang_guess
    FROM (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents)
    """


@register(
    "text_langid_ngram",
    _langid_sql(),
    doc=(
        "language-ID heuristic: per-language stopword-hit ratios, argmax with "
        "deterministic (count desc, lang asc) tiebreak; actual lang column kept "
        "for accuracy eyeballing."
    ),
)
def text_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents", fanout=True)
    t = tokens(F.col("text"))
    return d.select(
        "doc_id",
        "lang",
        *[stopword_ratio(t, lang).alias(f"ratio_{lang}") for lang in sorted(STOPWORDS)],
        lang_guess(t).alias("lang_guess"),
    )


# Document fingerprinting (md5 over the sorted distinct token set,
# functions/text.fingerprint) has no standalone registry entry: the
# identical expression is hash-verified per-document inside
# dedup_exact_hashes' token_set branch (queries/dedup.py).


# ------------------------------------------------------------------ multimodal


@register(
    "mm_payload_stats",
    """
    SELECT doc_id AS media_id,
           'text/plain' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS checksum,  -- DuckDB sha256 takes VARCHAR; same UTF-8 bytes
           lower(hex(encode(substring(text, 1, 8)))) AS prefix_hex
    FROM documents
    """,
    doc=(
        "multimodal payload plumbing: binary column + typed metadata as pure "
        "expressions (payload pruned for metadata-only readers)."
    ),
)
def mm_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents", fanout=True)
    pf = payload_frame(
        d, F.col("doc_id"), F.encode(F.col("text"), "UTF-8"), F.lit("text/plain")
    )
    return pf.select(
        "media_id",
        "media_type",
        "n_bytes",
        "checksum",
        F.lower(F.hex(F.encode(F.substring(F.col("payload").cast("string"), 1, 8), "UTF-8"))).alias("prefix_hex"),
    )


@register(
    "mm_decode_stub",
    None,  # rows-only: decode kernel is a stub (no media libs in container)
    doc=(
        "multimodal decode pipeline: Arrow mapInPandas batches over binary "
        "payloads with a deterministic fake decoder (real decoder is the "
        "documented NotImplementedError seam)."
    ),
)
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents", fanout=True)
    pf = payload_frame(
        d, F.col("doc_id"), F.encode(F.col("text"), "UTF-8"), F.lit("text/plain")
    )
    return decode_metadata(pf, mode="fake")

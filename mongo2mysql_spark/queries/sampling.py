"""Deterministic split/sampling queries (extension layer).

Train/val/test assignment and down-sampling for a training-data
pipeline, built on the salted-md5 bucket primitive in
operators/sampling.py — reproducible, repartition-stable, and
bit-identical in DuckDB, so the oracle verifies the actual assignment
of every document (via per-stratum min/max/count), not a statistical
approximation of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo2mysql_spark.operators.sampling import (
    hash_sample_flag,
    hash_split,
    sql_hash_sample_flag,
    sql_hash_split,
    sql_weighted_mixture_flag,
    weighted_mixture_flag,
)

# Data-mixing rates per language domain (an experiment config in a real
# run): upsample en, progressively downsample the rest.
MIX_RATES = {"en": 1.0, "de": 0.5, "es": 0.25, "fr": 0.1}
MIX_DEFAULT = 0.05
from mongo2mysql_spark.queries import register
from mongo2mysql_spark.sources import load_table as T


@register(
    "sample_split_stratified",
    f"""
    WITH labeled AS (
      SELECT doc_id, lang, n_chars,
             {sql_hash_split("doc_id")} AS split,
             {sql_hash_sample_flag("doc_id")} AS sampled,
             {sql_weighted_mixture_flag("doc_id", "lang", MIX_RATES, MIX_DEFAULT)} AS mixed
      FROM documents)
    SELECT split, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(sampled) AS BIGINT) AS n_sampled,
           CAST(sum(mixed) AS BIGINT) AS n_mixed,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id
    FROM labeled GROUP BY split, lang
    """,
    doc=(
        "deterministic 80/10/10 train/val/test split, a 10% sample "
        "flag, and a per-domain data-mixing keep flag (en 1.0 / de 0.5 / "
        "es 0.25 / fr 0.1 / default 0.05), all salted-md5 hex buckets, "
        "audited per (split, language) stratum.  Narrow per-row expressions, one aggregation shuffle; "
        "the split of any given document never changes with partitioning, "
        "cluster size, or run order."
    ),
)
def sample_split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    key = F.col("doc_id")
    return (
        d.select(
            "doc_id",
            "lang",
            "n_chars",
            hash_split(key).alias("split"),
            hash_sample_flag(key).alias("sampled"),
            weighted_mixture_flag(key, F.col("lang"), MIX_RATES, MIX_DEFAULT).alias("mixed"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("sampled").cast("long").alias("n_sampled"),
            F.sum("mixed").cast("long").alias("n_mixed"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )

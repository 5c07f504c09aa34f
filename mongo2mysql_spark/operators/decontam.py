"""Benchmark decontamination (extension layer): flag training documents
that share n-grams with an evaluation/benchmark set, so eval data can be
scrubbed from the corpus before training — standard practice in every
published LLM data pipeline (GPT-3 appendix C, Llama, Gopher all
describe n-gram-overlap decontamination).

Scale shape: the benchmark side (eval sets — thousands of documents) is
tiny next to the corpus, so its distinct shingle-hash set is BROADCAST;
the corpus side is one narrow explode of integer shingle hashes followed
by a single partial-aggregated groupBy(doc_id).  No shuffle ever carries
document text: shingles become 8-byte longs before the join, and the
broadcast is a set of longs.  At 100 TB the plan is: scan → project
hashes (codegen) → explode → broadcast-hash left join → hash-agg keyed
on doc_id (map-side combine first).  Nothing is quadratic and no global
structure exists beyond the broadcast set.

Deterministic across engines: shingle hashes are 48-bit md5-prefix
integers (`functions/text.shingle_hashes`), counts are exact ints and
the contamination fraction is a single int/int double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo2mysql_spark.functions.text import shingle_hashes, tokens


def contamination_profile(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_overlap_frac: float = 0.0,
) -> DataFrame:
    """Per corpus document: distinct n-gram count, how many of those
    n-grams appear anywhere in ``benchmark``, the overlap fraction, and
    a ``contaminated`` verdict.

    A document is contaminated when it shares at least one n-gram with
    the benchmark AND its overlap fraction reaches ``min_overlap_frac``
    (0.0 = any single shared n-gram taints, the conservative default —
    published pipelines use n around 8-13 so a chance collision is
    already a near-verbatim phrase).

    Returns (id_col, n_shingles, n_contaminated, contamination_frac,
    contaminated) — one row per input document, including documents too
    short to produce any n-gram (they are never contaminated).
    """
    doc_sh = docs.select(
        F.col(id_col),
        F.explode_outer(F.array_distinct(shingle_hashes(tokens(F.col(text_col)), n))).alias(
            "__h"
        ),
    )
    bench_sh = (
        benchmark.select(
            F.explode(F.array_distinct(shingle_hashes(tokens(F.col(text_col)), n))).alias("__h")
        )
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    prof = (
        doc_sh.join(F.broadcast(bench_sh), "__h", "left")
        .groupBy(id_col)
        .agg(
            F.count("__h").alias("n_shingles"),
            F.coalesce(F.sum("__hit"), F.lit(0)).alias("n_contaminated"),
        )
    )
    frac = F.when(
        F.col("n_shingles") > 0,
        F.col("n_contaminated").cast("double") / F.col("n_shingles").cast("double"),
    ).otherwise(F.lit(0.0))
    return prof.select(
        id_col,
        "n_shingles",
        "n_contaminated",
        frac.alias("contamination_frac"),
        (
            (F.col("n_contaminated") > 0)
            & (
                F.col("n_contaminated").cast("double")
                >= F.lit(float(min_overlap_frac)) * F.col("n_shingles").cast("double")
            )
        ).alias("contaminated"),
    )


def remove_contaminated(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_overlap_frac: float = 0.0,
) -> DataFrame:
    """The scrub itself: ``docs`` minus contaminated rows.  Implemented
    as a broadcast-profile join rather than a blind anti-join so the
    decision threshold matches `contamination_profile` exactly."""
    flagged = contamination_profile(
        docs, benchmark, id_col=id_col, text_col=text_col, n=n,
        min_overlap_frac=min_overlap_frac,
    ).filter(F.col("contaminated"))
    return docs.join(flagged.select(id_col), id_col, "left_anti")

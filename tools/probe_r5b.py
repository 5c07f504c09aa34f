"""10x scaling probe for the round-5 second-wave operators (same
protocol as the COVERAGE.md probes): replicate the sf0.01 corpus 10x
with perturbed ids, run each new operator at 1x and 10x, report wall
ratios.  Usage: python tools/probe_r5b.py"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mongo2mysql_spark.session import build_session

SF = "/root/testdata/sf0.01"


def docs_at(spark, mult: int):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    if mult == 1:
        return d
    legs = [
        d.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            # perturb so replicas are near-dups, not byte dups
            F.concat(F.col("text"), F.lit(f" probe{i}")).alias("text"),
            "lang", "source", "n_chars",
        )
        for i in range(mult)
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def part_at(spark, mult: int):
    p = spark.read.parquet(f"{SF}/part.parquet")
    if mult == 1:
        return p
    legs = [
        p.select(
            (F.col("p_partkey") + F.lit(i * 1_000_000)).alias("p_partkey"),
            "p_name", "p_brand",
        )
        for i in range(mult)
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def run(spark, mult: int) -> dict[str, float]:
    from mongo2mysql_spark.functions.text import shingle_hashes, tokens
    from mongo2mysql_spark.operators.bloom import bloom_build, bloom_probe
    from mongo2mysql_spark.operators.c4 import c4_clean
    from mongo2mysql_spark.operators.dedup import fuzzy_value_pairs
    from mongo2mysql_spark.operators.html import extract_title, strip_html
    from mongo2mysql_spark.operators.urls import host_profile, url_dedup
    from mongo2mysql_spark.queries.corpus import _c4_page_expr
    from mongo2mysql_spark.queries.dedup import _url_expr
    from mongo2mysql_spark.queries.text import _html_page_expr

    d = docs_at(spark, mult).persist()
    d.count()
    p = part_at(spark, mult)
    out = {}

    t0 = time.time()
    page = d.select("doc_id", _c4_page_expr().alias("text"))
    c4_clean(page).agg(F.sum("n_lines_kept"), F.sum(F.col("page_kept").cast("int"))).collect()
    out["c4_clean"] = time.time() - t0

    t0 = time.time()
    page = d.select("doc_id", _html_page_expr().alias("page"))
    page.select(
        F.length(strip_html(F.col("page"))).alias("n"),
        extract_title(F.col("page")).alias("t"),
    ).agg(F.sum("n"), F.count("t")).collect()
    out["html_strip"] = time.time() - t0

    t0 = time.time()
    urls = d.select("doc_id", _url_expr().alias("url"))
    url_dedup(urls).agg(F.count(F.lit(1)), F.sum("n_docs")).collect()
    host_profile(urls).agg(F.count(F.lit(1)), F.sum("n_urls")).collect()
    out["url_curation"] = time.time() - t0

    t0 = time.time()
    doc_sh = d.select(
        "doc_id",
        F.explode(F.array_distinct(shingle_hashes(tokens(F.col("text")), 8))).alias("h"),
    )
    bench_sh = doc_sh.filter(F.col("doc_id") % 97 == 0).select("h").distinct()
    fltr = bloom_build(bench_sh, "h")
    member = bloom_probe(doc_sh, fltr, "h")
    doc_sh.join(member, "h").groupBy("doc_id").agg(
        F.sum(F.when(F.col("maybe_member"), 1).otherwise(0))
    ).agg(F.count(F.lit(1))).collect()
    out["bloom_decontam"] = time.time() - t0

    t0 = time.time()
    fuzzy_value_pairs(
        p, "p_partkey", "p_name",
        F.element_at(F.split(F.col("p_name"), " "), 2), max_dist=4,
    ).agg(F.count(F.lit(1))).collect()
    out["fuzzy_pairs"] = time.time() - t0

    d.unpersist()
    return out


def main():
    spark = build_session(app_name="probe-r5b")
    for mult in (1, 10):
        r = run(spark, mult)
        print(f"mult={mult}: " + ", ".join(f"{k}={v:.1f}s" for k, v in r.items()),
              flush=True)


if __name__ == "__main__":
    main()

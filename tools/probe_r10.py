"""Round-10 scaling probe: 10x perturbed replication of the sf0.01
fixtures, wall ratio per new operator (the round-3 protocol — 1x runs
first so it absorbs JIT/codegen warmup).

Covers the r10 additions whose scale story is non-trivial:
- cms_build (cell-bounded aggregate: ratio should track the SCAN, the
  grid stays d·w regardless of rows)
- encoding_stats (per-row-group lag windows: bounded partitions)
- ngram_novelty (gram-keyed min-id aggregate + join back)
- exact_dup_spans (gram count + semi-join + per-doc window)
- posting_compression (per-term posting windows)
- label_propagation (2 rounds of edge-keyed join + argmax)
- funnel_max_level (anchors × step-events per user)

Documents replicate with OFFSET doc ids but UNCHANGED text — the hard
direction for the gram/posting operators: replication multiplies
posting-list lengths and dup-gram fan-out tenfold while vocabulary
stays fixed.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mongo2mysql_spark.session import build_session

SF = "/root/testdata/sf0.01"


def replicate(df, times: int, id_cols: list[str]):
    out = []
    for r in range(times):
        c = df
        for ic in id_cols:
            c = c.withColumn(ic, F.col(ic) + F.lit(r * 10_000_000))
        if "ts" in df.columns:
            c = c.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {r} SECONDS"))
        out.append(c)
    u = out[0]
    for c in out[1:]:
        u = u.unionByName(c)
    return u


def wall(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = build_session(app_name="probe-r10")
    from mongo2mysql_spark.functions.text import tokens
    from mongo2mysql_spark.operators.behavior import funnel_max_level
    from mongo2mysql_spark.operators.cms import cms_build
    from mongo2mysql_spark.operators.labelprop import label_propagation
    from mongo2mysql_spark.operators.novelty import ngram_novelty
    from mongo2mysql_spark.operators.passages import exact_dup_spans
    from mongo2mysql_spark.operators.postings import posting_compression
    from mongo2mysql_spark.operators.profile import encoding_stats
    from mongo2mysql_spark.sources.parquet import load_table

    d1 = load_table(spark, SF, "documents").localCheckpoint()
    li1 = load_table(spark, SF, "lineitem").localCheckpoint()
    ev1 = load_table(spark, SF, "events").localCheckpoint()
    d10 = replicate(d1, 10, ["doc_id"]).localCheckpoint()
    li10 = replicate(li1, 10, []).localCheckpoint()
    ev10 = replicate(ev1, 10, ["event_id"]).localCheckpoint()

    def run(name, f1, f10):
        t1 = wall(f1)
        t10 = wall(f10)
        print(
            f"{name}: 1x {t1}s  10x {t10}s  "
            f"ratio {round(t10 / max(t1, 1e-9), 1)}"
        )

    run(
        "cms_build",
        lambda: noop(cms_build(li1, "l_suppkey")),
        lambda: noop(cms_build(li10, "l_suppkey")),
    )
    enc_cols = ["l_returnflag", "l_linestatus", "l_suppkey"]
    enc_order = ["l_orderkey", "l_linenumber"] + enc_cols
    run(
        "encoding_stats",
        lambda: noop(encoding_stats(li1, enc_cols, enc_order,
                                    "l_orderkey DIV 2000")),
        lambda: noop(encoding_stats(li10, enc_cols, enc_order,
                                    "l_orderkey DIV 2000")),
    )
    run(
        "ngram_novelty",
        lambda: noop(ngram_novelty(d1, "doc_id", tokens(F.col("text")))),
        lambda: noop(ngram_novelty(d10, "doc_id", tokens(F.col("text")))),
    )
    run(
        "exact_dup_spans",
        lambda: noop(exact_dup_spans(d1, "doc_id", "text")),
        lambda: noop(exact_dup_spans(d10, "doc_id", "text")),
    )
    run(
        "posting_compression",
        lambda: noop(posting_compression(d1, "doc_id",
                                         tokens(F.col("text")))),
        lambda: noop(posting_compression(d10, "doc_id",
                                         tokens(F.col("text")))),
    )
    seeds1 = d1.select(F.col("doc_id").alias("id"),
                       F.col("lang").alias("label"))
    seeds10 = d10.select(F.col("doc_id").alias("id"),
                         F.col("lang").alias("label"))
    edges1 = (
        d1.select((F.col("doc_id") % 500).alias("src"),
                  ((F.col("doc_id") * 7 + 1) % 500).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .localCheckpoint()
    )
    edges10 = (
        d10.select((F.col("doc_id") % 5000).alias("src"),
                    ((F.col("doc_id") * 7 + 1) % 5000).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .localCheckpoint()
    )
    run(
        "label_propagation(2)",
        lambda: noop(label_propagation(seeds1, edges1, iters=2)),
        lambda: noop(label_propagation(seeds10, edges10, iters=2)),
    )
    steps = ["signup", "view", "click", "purchase"]
    run(
        "funnel_max_level",
        lambda: noop(funnel_max_level(
            ev1, "user_id", "event_type", "ts", "event_id", steps,
            86_400_000)),
        lambda: noop(funnel_max_level(
            ev10, "user_id", "event_type", "ts", "event_id", steps,
            86_400_000)),
    )
    # wave 2
    from mongo2mysql_spark.operators.histjoin import hist_join_estimate
    from mongo2mysql_spark.operators.rollup import sliding_distinct_hll
    from mongo2mysql_spark.operators.selection import selectivity_estimate

    od1 = load_table(spark, SF, "orders").localCheckpoint()
    cu1 = load_table(spark, SF, "customer").localCheckpoint()
    od10 = replicate(od1, 10, []).localCheckpoint()
    run(
        "hist_join_estimate",
        lambda: noop(hist_join_estimate(od1, "o_custkey", cu1,
                                        "c_custkey", with_exact=True)),
        lambda: noop(hist_join_estimate(od10, "o_custkey", cu1,
                                        "c_custkey", with_exact=True)),
    )
    run(
        "sliding_distinct_hll(24h)",
        lambda: noop(sliding_distinct_hll(ev1, "event_type", "ts",
                                          "user_id")),
        lambda: noop(sliding_distinct_hll(ev10, "event_type", "ts",
                                          "user_id")),
    )
    ranges = [(0.0, 20000.0, "lo"), (20000.0, 60000.0, "mid")]
    run(
        "selectivity_estimate",
        lambda: noop(selectivity_estimate(li1, "l_extendedprice", ranges)),
        lambda: noop(selectivity_estimate(li10, "l_extendedprice", ranges)),
    )
    spark.stop()


if __name__ == "__main__":
    main()

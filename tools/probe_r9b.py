"""Round-9 wave-2/3 scaling probe: 10x perturbed replication of the
sf0.01 fixtures, wall ratio per operator (the round-3 protocol — 1x
runs first so it absorbs JIT/codegen warmup)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mongo2mysql_spark.session import build_session

SF = "/root/testdata/sf0.01"


def replicate(df, times: int, id_cols: list[str]):
    """times perturbed copies: ids offset per replica so replicas are
    distinct rows, values/timestamps jittered by the replica index."""
    out = []
    for r in range(times):
        c = df
        for ic in id_cols:
            c = c.withColumn(ic, F.col(ic) + F.lit(r * 10_000_000))
        if "value" in df.columns:
            c = c.withColumn("value", F.col("value") + F.lit(r * 0.001))
        if "ts" in df.columns:
            c = c.withColumn(
                "ts", F.col("ts") + F.expr(f"INTERVAL {r} SECONDS")
            )
        out.append(c)
    u = out[0]
    for c in out[1:]:
        u = u.unionByName(c)
    return u


def wall(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def main() -> None:
    spark = build_session(app_name="probe-r9b")
    from mongo2mysql_spark.operators.basket import association_rules
    from mongo2mysql_spark.operators.components import (
        connected_components,
        incremental_components,
    )
    from mongo2mysql_spark.operators.drift import cusum_changepoints
    from mongo2mysql_spark.operators.rollup import sliding_distinct
    from mongo2mysql_spark.operators.selection import grouped_exact_quantiles
    from mongo2mysql_spark.sources.parquet import load_table

    ev1 = load_table(spark, SF, "events").localCheckpoint()
    li1 = load_table(spark, SF, "lineitem").localCheckpoint()
    # replicas keep the SAME user/order key space (activity volume
    # grows, key cardinality does not — the hard direction for
    # distinct/pair operators)
    ev10 = replicate(ev1, 10, ["event_id"]).localCheckpoint()
    li10 = replicate(li1, 10, []).localCheckpoint()

    def run(name, f1, f10):
        t1 = wall(f1)
        t10 = wall(f10)
        print(f"{name}: 1x {t1}s  10x {t10}s  ratio {round(t10 / max(t1, 1e-9), 1)}")

    run(
        "sliding_distinct(24h)",
        lambda: sliding_distinct(ev1, "event_type", "ts", "user_id").write
        .format("noop").mode("overwrite").save(),
        lambda: sliding_distinct(ev10, "event_type", "ts", "user_id").write
        .format("noop").mode("overwrite").save(),
    )
    run(
        "association_rules",
        lambda: association_rules(li1, "l_orderkey", "l_partkey", 5, 2)
        .write.format("noop").mode("overwrite").save(),
        lambda: association_rules(li10, "l_orderkey", "l_partkey", 5, 2)
        .write.format("noop").mode("overwrite").save(),
    )
    run(
        "grouped_exact_quantiles",
        lambda: grouped_exact_quantiles(
            li1, ["l_returnflag"], "l_extendedprice", {"p50": 0.5, "p90": 0.9}
        ).write.format("noop").mode("overwrite").save(),
        lambda: grouped_exact_quantiles(
            li10, ["l_returnflag"], "l_extendedprice", {"p50": 0.5, "p90": 0.9}
        ).write.format("noop").mode("overwrite").save(),
    )
    run(
        "cusum",
        lambda: cusum_changepoints(
            ev1, ["event_type"], "value", "ts", "event_id", 10_000_000,
            500_000_000,
        ).write.format("noop").mode("overwrite").save(),
        lambda: cusum_changepoints(
            ev10, ["event_type"], "value", "ts", "event_id", 10_000_000,
            500_000_000,
        ).write.format("noop").mode("overwrite").save(),
    )

    # incremental CC: history closure once, then fold a SMALL batch —
    # the delta cost must track the batch, not the history
    rng_pairs = (
        li1.select(
            (F.col("l_orderkey") % 5000).alias("id_1"),
            (F.col("l_partkey") % 5000).alias("id_2"),
        )
        .filter(F.col("id_1") != F.col("id_2"))
        .localCheckpoint()
    )
    hist = connected_components(rng_pairs, "id_1", "id_2").localCheckpoint()
    small = rng_pairs.limit(200).localCheckpoint()
    t_inc = wall(
        lambda: incremental_components(hist, small).write.format("noop")
        .mode("overwrite").save()
    )
    t_full = wall(
        lambda: connected_components(
            rng_pairs.unionByName(small), "id_1", "id_2"
        ).write.format("noop").mode("overwrite").save()
    )
    print(f"incremental_cc: fold-200-edges {t_inc}s  re-close-all {t_full}s")
    spark.stop()


if __name__ == "__main__":
    main()

"""Round-12 100x probes (VERDICT r11 next-round #3 + #1's COVERAGE
note) — same protocol as tools/probe_scale100.py: scale the
shuffle-bearing input 1x/10x/100x and read ACTUAL shuffle bytes from
the Spark status REST API per job group.

- ``sliding_dau_fixed_users`` — the hypertable slot's exact sliding-
  DAU (operators/rollup.sliding_distinct): events replicated with the
  SAME users and timestamps, so raw rows grow 100x while activity
  cells (distinct user-hours) stay FIXED.  The covered-window
  expansion claim (cost = cells x k, never events x k) predicts flat
  post-dedup shuffle; super-linear growth would falsify it.
- ``sliding_dau_more_users`` — the same operator with USERS replicated
  too (cells grow linearly): shuffle must grow linearly in cells, the
  other half of the cells-x-k claim.
- ``cms_fold`` — the cmsstream store's fold chain
  (streaming/cmsstore.refresh_cms_store x3 over row-sliced input):
  grid state is d x w integers regardless of rows, so shuffle must
  stay FLAT at any scale; wall grows only with the map-side-combined
  build scans.
- ``joinexec_order`` — the r12 executor on a skewed 4-table chain:
  the DP-chosen bushy order vs the worst enumerated order (cost-
  maximizing split), same broadcast policy — the wall/shuffle gap IS
  what the join-order DP buys (the COVERAGE note VERDICT #1 asks for).

Emits one JSON line per measurement plus a COVERAGE.md markdown table.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mongo2mysql_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
SCALES = (1, 10, 100)


def _rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def measure(spark, label: str, action):
    sc = spark.sparkContext
    sc.setJobGroup(label, label)
    t0 = time.time()
    out_rows = action()
    wall = time.time() - t0
    sc.setJobGroup("", "")
    jobs = [j for j in _rest(spark, "/jobs") if j.get("jobGroup") == label]
    stage_ids = {s for j in jobs for s in j["stageIds"]}
    sw = sr = 0
    for s in _rest(spark, "/stages"):
        if s["stageId"] in stage_ids and s["status"] == "COMPLETE":
            sw += s.get("shuffleWriteBytes", 0)
            sr += s.get("shuffleReadBytes", 0)
    return {
        "wall_s": round(wall, 2),
        "shuffle_write_mb": round(sw / 1e6, 2),
        "shuffle_read_mb": round(sr / 1e6, 2),
        "out_rows": out_rows,
    }


def replicate(df, ids, factor):
    r = df.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__r")
    )
    out = r
    for c in ids:
        out = out.withColumn(c, F.col(c) + F.col("__r") * F.lit(10_000_000))
    return out.drop("__r")


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = build_session(
        app_name="probe-r12",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mongo2mysql_spark.operators.rollup import sliding_distinct
    from mongo2mysql_spark.sources.parquet import load_table

    ev = load_table(spark, SF_DIR, "events")
    li = load_table(spark, SF_DIR, "lineitem")
    n_ev, n_li = ev.count(), li.count()
    results = []

    def record(row):
        results.append(row)
        print(json.dumps(row), flush=True)

    for scale in SCALES:
        # --- sliding DAU, fixed user space (cells constant)
        evs = replicate(ev, ["event_id"], scale)
        m = measure(
            spark, f"sliding_dau_fixed_users@{scale}",
            lambda e=evs: sliding_distinct(
                e, "event_type", "ts", "user_id", window_hours=24
            ).count(),
        )
        record({"family": "sliding_dau_fixed_users", "scale": scale,
                "rows_in": n_ev * scale, **m})
        # --- sliding DAU, users replicated (cells grow linearly)
        evu = replicate(ev, ["event_id", "user_id"], scale)
        m = measure(
            spark, f"sliding_dau_more_users@{scale}",
            lambda e=evu: sliding_distinct(
                e, "event_type", "ts", "user_id", window_hours=24
            ).count(),
        )
        record({"family": "sliding_dau_more_users", "scale": scale,
                "rows_in": n_ev * scale, **m})
        # --- cmsstream fold chain: three row-sliced folds into one
        # store (the batch entry point the foreachBatch handler calls)
        import shutil
        import tempfile

        from mongo2mysql_spark.operators.cms import cms_estimate
        from mongo2mysql_spark.streaming.cmsstore import (
            read_cms_store,
            refresh_cms_store,
        )

        lis = replicate(li, ["l_orderkey"], scale)
        work = tempfile.mkdtemp(prefix="probe_cms_")
        store = os.path.join(work, "store")
        os.makedirs(store)

        def fold_chain(frame=lis, st=store):
            for i in range(3):
                refresh_cms_store(
                    frame.filter(F.col("l_orderkey") % 3 == i)
                    .select("l_suppkey"),
                    st, "l_suppkey", depth=4, width=512,
                    writer=f"w{i}", epoch=0,
                )
            grid = read_cms_store(spark, st)
            keys = spark.range(10).select(
                (F.col("id") + 1).alias("k")
            )
            return cms_estimate(grid, keys, "k", depth=4, width=512).count()

        m = measure(spark, f"cms_fold@{scale}", fold_chain)
        shutil.rmtree(work, ignore_errors=True)
        record({"family": "cms_fold", "scale": scale,
                "rows_in": n_li * scale, **m})
        spark.catalog.clearCache()

    # --- joinexec: chosen vs worst order on a skewed chain (one scale)
    from mongo2mysql_spark.operators.joinexec import (
        chain_plan_tree,
        execute_chain_plan,
    )
    from mongo2mysql_spark.operators.joinorder import (
        chain_join_stats,
        chain_plan_dp,
    )

    n_b = 1_000_000
    a = spark.range(1, n_b // 100).select(F.col("id").alias("ka"))
    b = spark.range(1, n_b + 1).select(
        F.col("id").alias("kab"), F.col("id").alias("kbc")
    )
    c = (
        spark.range(5 * n_b)
        .select(
            (F.col("id") % n_b + 1).alias("kcb"),
            (F.col("id") % (n_b * 5) + 1).alias("kcd"),
        )
    )
    d = spark.range(1, n_b // 20).select(F.col("id").alias("kdc"))
    tables = [("a", a), ("b", b), ("c", c), ("d", d)]
    edges = [("ka", "kab"), ("kbc", "kcb"), ("kcd", "kdc")]
    rows, est6 = chain_join_stats(tables, edges, n_buckets=16)
    est, cost, split = chain_plan_dp(rows, est6)
    # worst order: the cost-MAXIMIZING split over the same estimates
    wcost: dict = {(i, i): 0 for i in range(4)}
    wsplit: dict = {}
    for length in range(2, 5):
        for i in range(0, 4 - length + 1):
            j = i + length - 1
            worst, worst_cut = None, None
            for cut in range(i, j):
                cc = wcost[(i, cut)] + wcost[(cut + 1, j)] + est[(i, j)]
                if worst is None or cc > worst:
                    worst, worst_cut = cc, cut
            wcost[(i, j)] = worst
            wsplit[(i, j)] = cut if worst_cut is None else worst_cut
    names = [n for n, _ in tables]
    for tag, sp in (("chosen", split), ("worst", wsplit)):
        m = measure(
            spark, f"joinexec_{tag}",
            lambda s=sp: execute_chain_plan(tables, edges, est, s)
            .groupBy().count().collect()[0][0],
        )
        record({"family": f"joinexec_{tag}", "scale": 1,
                "rows_in": sum(rows),
                "tree": str(chain_plan_tree(names, sp)), **m})

    print("\n| family | scale | rows in | wall s | shuffle write MB |"
          " shuffle read MB | out rows |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['family']} | {r['scale']}x | {r['rows_in']:,} |"
              f" {r['wall_s']} | {r['shuffle_write_mb']} |"
              f" {r['shuffle_read_mb']} | {r['out_rows']:,} |")
    spark.stop()


if __name__ == "__main__":
    main()

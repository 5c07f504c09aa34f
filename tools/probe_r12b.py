"""Late-round-12 scale probes — same REST-measured-shuffle protocol
as probe_r12.py, for the two operators added after it:

- ``priority_sample`` at 1x/10x/100x input rows (fixed group count):
  the two-phase salted top-k keeps per-group state at k+1 rows, so
  post-scan shuffle must stay ~FLAT while the scan grows linearly —
  the bounded-state claim of the priostore.
- ``bloomjoin`` probe-side shuffle with vs without the prefilter at
  1x/10x: the filter is applied scan-side (a pure expression), so the
  JOIN's shuffled bytes must drop by ~the reject rate, and the gap
  must grow linearly with the probe side.
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


def main() -> None:
    spark = build_session(
        app_name="probe-r12b",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = []

    def record(row):
        results.append(row)
        print(json.dumps(row), flush=True)

    from mongo2mysql_spark.operators.priority import priority_sample

    for scale in (1, 10, 100):
        n = 100_000 * scale
        df = spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.pmod(F.hash(F.col("id")), F.lit(20)) + 1)
            .cast("string").alias("grp"),
            (F.pmod(F.hash(F.col("id") * 31), F.lit(5000)) + 1)
            .alias("w"),
        )
        m = measure(
            spark, f"priority@{scale}",
            lambda d=df: priority_sample(
                d, "doc_id", "w", k=16, group_cols=["grp"]
            ).count(),
        )
        record({"family": "priority_sample", "scale": scale,
                "rows_in": n, **m})

    from mongo2mysql_spark.operators.bloomjoin import (
        bloom_build,
        bloom_might_contain,
        bloom_words_array,
    )

    build = spark.range(1, 3001).select(
        (F.col("id") * 7).alias("bk"), F.col("id").alias("attr")
    )
    words = bloom_words_array(
        bloom_build(build, "bk", 512, 3), 512
    )
    for scale in (1, 10):
        n = 1_000_000 * scale
        probe = spark.range(n).select(
            F.col("id").alias("pid"),
            (F.pmod(F.hash(F.col("id")), F.lit(60_000)) + 1).alias("pk"),
        )
        # broadcast disabled so the join SHUFFLES the probe side —
        # the worst case the prefilter exists to cut
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            for tag, pf in (
                ("plain", probe),
                ("bloom", probe.filter(
                    bloom_might_contain(F.col("pk"), words, 3)
                )),
            ):
                m = measure(
                    spark, f"bloomjoin_{tag}@{scale}",
                    lambda p=pf: p.join(
                        build, F.col("pk") == F.col("bk")
                    ).groupBy().count().collect()[0][0],
                )
                record({"family": f"bloomjoin_{tag}", "scale": scale,
                        "rows_in": n, **m})
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", old
            )

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

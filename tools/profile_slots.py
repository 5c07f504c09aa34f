"""Per-slot execution profile: wall, job count, task count, shuffle
bytes for each headline bench slot (or a named subset).

Usage: python tools/profile_slots.py [slot ...]

Methodology matches bench.py (noop sink, same session settings) but
adds a job-group per slot and reads the status tracker + REST API so
each slot's cost decomposes into scheduling overhead (many small jobs)
vs real shuffle/compute.  This is measurement tooling only — never on
any query path.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongo2mysql_spark.queries import load_all  # noqa: E402
from mongo2mysql_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    spark = build_session(
        app_name="slot-profile",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    from bench import HEADLINE  # noqa: E402

    names = sys.argv[1:] or HEADLINE
    base = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[-1]}/api/v1"
    app_id = spark.sparkContext.applicationId

    # warmups, mirroring bench.py
    for warm in ("q1_pricing_summary", "q3_shipping_priority", "q5_regional_revenue"):
        registry[warm].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    rows = []
    for name in names:
        sc = spark.sparkContext
        sc.setJobGroup(name, name)
        jobs_before = {j["jobId"] for j in rest(base, f"/applications/{app_id}/jobs")}
        t0 = time.time()
        df = registry[name].fn(spark, SF_DIR)
        t_build = time.time() - t0
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t_mat = time.time() - t0
        jobs = [
            j
            for j in rest(base, f"/applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        n_tasks = sum(j.get("numTasks", 0) for j in jobs)
        stages = rest(base, f"/applications/{app_id}/stages?status=complete")
        stage_ids = {s for j in jobs for s in j.get("stageIds", [])}
        sh_read = sum(
            s.get("shuffleReadBytes", 0)
            for s in stages
            if s["stageId"] in stage_ids
        )
        sh_write = sum(
            s.get("shuffleWriteBytes", 0)
            for s in stages
            if s["stageId"] in stage_ids
        )
        rows.append(
            {
                "slot": name,
                "build_s": round(t_build, 3),
                "mat_s": round(t_mat, 3),
                "jobs": len(jobs),
                "tasks": n_tasks,
                "stages": len(stage_ids),
                "shuffle_read_mb": round(sh_read / 2**20, 2),
                "shuffle_write_mb": round(sh_write / 2**20, 2),
            }
        )
        sc.setJobGroup(None, None)
        spark.catalog.clearCache()
        print(json.dumps(rows[-1]), flush=True)

    print("\n=== sorted by build+mat ===")
    for r in sorted(rows, key=lambda r: -(r["build_s"] + r["mat_s"])):
        print(
            f"{r['build_s'] + r['mat_s']:8.2f}s  build={r['build_s']:6.2f} "
            f"mat={r['mat_s']:6.2f} jobs={r['jobs']:3d} stages={r['stages']:3d} "
            f"tasks={r['tasks']:5d} shW={r['shuffle_write_mb']:8.2f}MB  {r['slot']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

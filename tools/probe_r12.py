"""Per-slot phase probe for the r12 optimization round.

For each named headline slot: time fn() construction (cold + warm) and
the noop materialization separately, and count Spark jobs launched in
each phase (job-group bracketing via the status tracker).  This splits
"eager driver actions during query build" from "the actual computation"
— the guide §1 measurement the per-branch attribution can't see.

Usage: python tools/probe_r12.py slot [slot ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongo2mysql_spark.queries import load_all  # noqa: E402
from mongo2mysql_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    slots = sys.argv[1:]
    spark = build_session(
        app_name="probe_r12",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    tracker = spark.sparkContext.statusTracker()

    # warm python worker pool (same as bench)
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    def phase(group: str, thunk):
        spark.sparkContext.setJobGroup(group, group)
        t0 = time.time()
        out = thunk()
        dt = time.time() - t0
        spark.sparkContext.setJobGroup(None, None)
        jobs = len(tracker.getJobIdsForGroup(group))
        return out, dt, jobs

    for slot in slots:
        fn = registry[slot].fn
        for p in ("cold", "warm"):
            df, t_b, j_b = phase(f"{slot}.{p}.build", lambda: fn(spark, SF_DIR))
            _, t_m, j_m = phase(
                f"{slot}.{p}.mat",
                lambda: df.write.format("noop").mode("overwrite").save(),
            )
            print(
                f"{slot:32s} {p:4s} build {t_b:7.2f}s/{j_b:3d} jobs   "
                f"mat {t_m:7.2f}s/{j_m:3d} jobs   total {t_b + t_m:7.2f}s",
                flush=True,
            )
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()

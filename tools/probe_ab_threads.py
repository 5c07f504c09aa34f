"""Same-session A/B for the parallel_branches build-threading lever:
alternate serial (SPARK_GRAFT_BUILD_THREADS=1) and threaded passes of
the same slot inside ONE SparkSession, so co-tenant drift hits both
arms equally.  Reports per-arm walls and mins.

Usage: python tools/probe_ab_threads.py [-n PAIRS] slot [slot ...]
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
    args = sys.argv[1:]
    pairs = 3
    if args and args[0] == "-n":
        pairs = int(args[1])
        args = args[2:]
    spark = build_session(
        app_name="probe_ab_threads",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    def once(fn) -> float:
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        return time.time() - t0

    for slot in args:
        fn = registry[slot].fn
        once(fn)  # cold, untimed (memo builds)
        a, b = [], []
        for _ in range(pairs):
            os.environ["SPARK_GRAFT_BUILD_THREADS"] = "1"
            a.append(once(fn))
            os.environ["SPARK_GRAFT_BUILD_THREADS"] = "4"
            b.append(once(fn))
        os.environ.pop("SPARK_GRAFT_BUILD_THREADS", None)
        print(
            f"{slot:32s} serial min {min(a):7.2f}s {[round(x,2) for x in a]}"
            f"   threaded min {min(b):7.2f}s {[round(x,2) for x in b]}",
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Repeated warm-pass probe for the r12 optimization round (noisy-box
variant of probe_r12.py): after one untimed cold build+materialize
(pays the slot memos), run N warm build+materialize passes and report
each wall plus the min — the same robust statistic the bench uses.

Usage: python tools/probe_r12c.py [-n N] slot [slot ...]
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
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    spark = build_session(
        app_name="probe_r12c",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    def once(fn) -> tuple[float, float]:
        t0 = time.time()
        df = fn(spark, SF_DIR)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        return t1 - t0, t2 - t1

    for slot in args:
        fn = registry[slot].fn
        tb, tm = once(fn)  # cold: memo builds land here, untimed below
        walls = []
        for _ in range(n):
            b, m = once(fn)
            walls.append((b + m, b, m))
            spark.catalog.clearCache()
        best = min(walls)
        print(
            f"{slot:32s} cold {tb + tm:7.2f}s   "
            f"min {best[0]:7.2f}s (build {best[1]:.2f} mat {best[2]:.2f})   "
            f"all {[round(w[0], 2) for w in walls]}",
            flush=True,
        )


if __name__ == "__main__":
    main()

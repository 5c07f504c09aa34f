"""Replay the driver's CORRECTNESS gate at sf0.01 (the real gate SF).

tests/test_oracle.py runs the same compare at sf0.001 for speed; this
script is the pre-round sanity pass at the driver's actual scale, where
extra rows can surface tie-breaks or float drift the small fixture hides.

Usage: python tools/driver_sim.py [sf_dir] [query ...]
Prints one line per query and exits non-zero on any mismatch.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongo2mysql_spark.queries import load_all  # noqa: E402
from mongo2mysql_spark.session import build_session  # noqa: E402
from tests.oracle_utils import compare, duck_connection  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    registry = load_all()
    targets = sorted(names) if names else sorted(registry)
    spark = build_session(app_name="driver-sim")
    duck = duck_connection(sf_dir)
    rc = 0
    for name in targets:
        q = registry[name]
        t0 = time.time()
        try:
            df = q.fn(spark, sf_dir)
            if q.oracle is None:
                n = df.count()
                print(f"{name}: rows-only ({n} rows) [{time.time() - t0:.1f}s]")
                continue
            problems = compare(df, duck, q.oracle)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {str(exc)[:200]}")
            rc = 1
            continue
        if problems:
            print(f"{name}: FAIL " + " | ".join(p[:300] for p in problems))
            rc = 1
        else:
            print(f"{name}: ok [{time.time() - t0:.1f}s]")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())

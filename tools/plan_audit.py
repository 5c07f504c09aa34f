"""Reproducible plan audit over the full query registry: for every
registered (non-streaming) query, print each parquet scan's read-schema
width and whether filters reached the scan — the two signals that
column pruning and predicate pushdown survived the whole plan.

Usage: python tools/plan_audit.py [sf_dir]

A scan reading more columns than the query needs, or a selective query
with no pushed filters, is a plan regression: at 100 TB the difference
between scanning 2 columns and 12 is the whole I/O budget.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongo2mysql_spark.queries import load_all  # noqa: E402
from mongo2mysql_spark.session import build_session  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="plan-audit")
    rc = 0
    for name, q in sorted(load_all().items()):
        if name.startswith("streaming"):
            continue  # streams are plan-checked by their equivalence tests
        try:
            plan = q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {str(exc)[:140]}")
            rc = 1
            continue
        scans = []
        for m in re.finditer(
            r"FileScan parquet \[([^\]]*)\][^\n]*?Location[^\n]*?/(\w+)\.parquet", plan
        ):
            cols = [c.split("#")[0] for c in m.group(1).split(",") if c.strip()]
            scans.append(f"{m.group(2)}:{len(cols)}")
        pushed = len(re.findall(r"PushedFilters: \[[^\]]*\w", plan))
        cached = plan.count("InMemoryTableScan")
        print(
            f"{name}: scans[{' '.join(sorted(set(scans)))}] "
            f"pushedFilterScans={pushed} cacheReads={cached}"
        )
        spark.catalog.clearCache()
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())

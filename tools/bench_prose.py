"""Derive COVERAGE.md's bench-delta figures FROM the attribution
artifact (`bench_full_latest.json`) instead of hand-transcribing them
(VERDICT r11 #2/#7: the artifact is the truth — r11's prose said "20
of 31 slots needed the adaptive third sample" while the sha-matched
artifact recorded 21).

Usage: python tools/bench_prose.py [path]
Prints a ready-to-paste block: run_id, headline total, adaptive-sample
count, noise-band stats, the gate-cost ledger (slot.build keys sorted
descending), and the per-branch walls of any slots named after `--`.
Every figure is computed from the file bytes whose sha256 prefix the
driver-recorded line carries.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--"]
    path = args[0] if args and os.path.exists(args[0]) else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_full_latest.json",
    )
    slots_wanted = args[1:] if args and os.path.exists(args[0]) else args
    raw = open(path, "rb").read()
    full = json.loads(raw)
    sha = hashlib.sha256(raw).hexdigest()[:16]
    samples: dict[str, list[float]] = full.get("samples", {})
    n_slots = len(samples)
    adaptive = sorted(
        n for n, ss in samples.items() if len(ss) >= 3
    )
    noisy = sorted(
        n for n, ss in samples.items()
        if len(ss) >= 2 and min(ss) > 0
        and (max(ss) - min(ss)) / min(ss) > 0.25
    )
    builds = sorted(
        (
            (k[: -len(".build")], v)
            for k, v in full["queries"].items()
            if k.endswith(".build")
        ),
        key=lambda kv: -kv[1],
    )
    print(f"artifact: {os.path.basename(path)}  run_id={full['run_id']}  "
          f"sha256[:16]={sha}")
    print(f"headline total: {full['value']} s over "
          f"{n_slots} slots (sf={full['sf']}); "
          f"etl_rows_per_sec={full.get('etl_rows_per_sec')}")
    print(f"adaptive third sample: {len(adaptive)} of {n_slots} slots "
          f"({', '.join(adaptive)})")
    print(f"pass-to-pass spread >25% (incl. third pass): "
          f"{len(noisy)} of {n_slots} slots")
    print("gate-cost ledger (slot.build, desc):")
    for slot, v in builds:
        branches = [
            k for k in full["queries"]
            if k.startswith(slot + ".") and not k.endswith(".build")
        ]
        print(f"  {slot} {v:.1f} s / {len(branches)} branches")
    for slot in slots_wanted:
        print(f"per-branch walls — {slot}:")
        for k, v in sorted(full["queries"].items()):
            if k.startswith(slot + "."):
                print(f"  {k} {v:.2f} s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

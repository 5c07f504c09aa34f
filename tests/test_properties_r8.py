"""Property tests for the round-8 operators — seeded random batches
asserted in ONE Spark job each (the repo's style; per-example jobs
would be prohibitively slow).  Each property pits the distributed
operator against an independent driver-side Python reference."""

from __future__ import annotations

import itertools
import random
from datetime import datetime, timedelta

from pyspark.sql import functions as F

EV_SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string"


def _random_events(seed: int, n_users: int = 40, n_events: int = 600):
    rng = random.Random(seed)
    t0 = datetime(2024, 3, 1)
    rows = []
    for i in range(n_events):
        rows.append(
            (
                i,
                t0 + timedelta(minutes=rng.randint(0, 5000)),
                rng.randint(1, n_users),
                rng.choice(["signup", "view", "click", "purchase", "error"]),
            )
        )
    return rows


def _funnel_reference(rows, steps):
    """Driver-side reference: per user, scan events in (ts, id) order
    and advance the stage on the next needed step strictly after the
    previous completion."""
    by_user: dict[int, list] = {}
    for eid, ts, uid, typ in rows:
        by_user.setdefault(uid, []).append((ts, eid, typ))
    counts = [0] * len(steps)
    for evs in by_user.values():
        stage, last = 0, None
        for ts, eid, typ in sorted(evs):
            if stage < len(steps) and typ == steps[stage] and (
                last is None or (ts, eid) > last
            ):
                stage += 1
                last = (ts, eid)
        for s in range(stage):
            counts[s] += 1
    return {i + 1: c for i, c in enumerate(counts)}


def test_funnel_matches_python_reference_on_random_streams(spark):
    from mongo2mysql_spark.operators.behavior import funnel_counts

    steps = ["signup", "view", "purchase"]
    rows = []
    for seed in (1, 2, 3, 4, 5):
        rows += [
            (eid + seed * 100_000, ts, uid + seed * 1000, typ)
            for eid, ts, uid, typ in _random_events(seed)
        ]
    got = {
        r.step: r.users
        for r in funnel_counts(
            spark.createDataFrame(rows, EV_SCHEMA),
            "user_id", "event_type", "ts", "event_id", steps,
        ).collect()
    }
    assert got == _funnel_reference(rows, steps)


def test_kmv_merge_and_estimate_bounds_random_sets(spark):
    """sketch(A ∪ B) from the two sketches alone equals the direct
    union sketch at the SAMPLE level, and estimates stay within 4·RSE
    of truth, over seeded random overlapping id sets."""
    from mongo2mysql_spark.operators.kmv import kmv_sketch, kmv_stats, kmv_union

    k = 96
    rng = random.Random(42)
    for seed in (10, 11, 12):
        a_ids = rng.sample(range(seed * 1_000_000, seed * 1_000_000 + 40_000), 9_000)
        b_ids = rng.sample(range(seed * 1_000_000 + 20_000, seed * 1_000_000 + 60_000), 9_000)
        a = spark.createDataFrame([(v,) for v in a_ids], "v bigint")
        b = spark.createDataFrame([(v,) for v in b_ids], "v bigint")
        ska, skb = kmv_sketch(a, "v", k), kmv_sketch(b, "v", k)
        merged = sorted(r.h for r in kmv_union(ska, skb, k).collect())
        direct = sorted(
            r.h for r in kmv_sketch(a.unionByName(b), "v", k).collect()
        )
        assert merged == direct
        truth = len(set(a_ids) | set(b_ids))
        est = kmv_stats(kmv_union(ska, skb, k), k).collect()[0].est
        assert abs(est - truth) / truth < 4.0 / (k - 2) ** 0.5


def test_interval_overlap_matches_bruteforce_random(spark):
    from mongo2mysql_spark.operators.rangejoin import (
        interval_overlap_join_binned,
    )

    rng = random.Random(99)
    lrows = [
        (i, s, s + rng.randint(0, 90))
        for i, s in enumerate(rng.randint(-500, 500) for _ in range(120))
    ]
    rrows = [
        (j, s, s + rng.randint(0, 40))
        for j, s in enumerate(rng.randint(-500, 500) for _ in range(60))
    ]
    left = spark.createDataFrame(lrows, "lid int, ls long, le long")
    right = spark.createDataFrame(rrows, "rid int, rs long, re long")
    want = sorted(
        (li, rj)
        for (li, ls, le), (rj, rs, re) in itertools.product(lrows, rrows)
        if ls <= re and le >= rs
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join_binned(
            left, right, "ls", "le", "rs", "re", bin_width=32
        ).collect()
    )
    assert got == want and len(want) > 100


def test_transition_probs_sum_to_one_per_source(spark):
    from mongo2mysql_spark.operators.behavior import event_transitions

    rows = _random_events(7, n_users=25, n_events=400)
    out = event_transitions(
        spark.createDataFrame(rows, EV_SCHEMA),
        "user_id", "event_type", "ts", "event_id",
    ).collect()
    by_src: dict[str, float] = {}
    for r in out:
        by_src[r.event_type] = by_src.get(r.event_type, 0.0) + r.prob
    assert by_src and all(abs(v - 1.0) < 1e-9 for v in by_src.values())


def test_kcenter_cover_radius_is_next_pick_radius(spark):
    """Farthest-first invariant: after the k-th pick, the cover radius
    (max over points of the squared distance to the nearest selected
    center, computed by an independent driver-side reference) equals
    the radius the (k+1)-th pick reports."""
    from mongo2mysql_spark.operators.diversify import kcenter_select

    rng = random.Random(5)
    pts = {i: [float(rng.randint(-50, 50)) for _ in range(4)] for i in range(80)}
    df = spark.createDataFrame(
        [(i, v) for i, v in pts.items()], "id bigint, v array<double>"
    )
    got = kcenter_select(df, "id", "v", k=5).orderBy("rank").collect()
    centers = [r.center_id for r in got[:4]]
    cover = max(
        min(sum((a - b) ** 2 for a, b in zip(pts[p], pts[c])) for c in centers)
        for p in pts
        if p not in centers
    )
    assert got[4].radius == cover

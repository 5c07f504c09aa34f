"""Property tests for the round-9 operators — seeded random batches
pitted against independent driver-side Python references (the repo's
style: few Spark jobs, each covering many random cases)."""

from __future__ import annotations

import itertools
import math
import random

from pyspark.sql import functions as F


# --------------------------------------------------- exact quantile selection


def test_exact_quantiles_matches_python_reference(spark):
    """Histogram rank selection ≡ the sorted-array interpolation at
    h = (n−1)·q for random multisets with duplicates and negatives."""
    from mongo2mysql_spark.operators.selection import exact_quantiles

    rng = random.Random(97)
    vals = [round(rng.uniform(-500, 500), 2) for _ in range(3001)]
    vals += vals[:300]  # planted duplicates
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    qs = {"q05": 0.05, "q37": 0.37, "q50": 0.5, "q99": 0.99}
    got = exact_quantiles(df, "v", qs).collect()[0]
    s = sorted(vals)
    n = len(s)
    for name, q in qs.items():
        h = (n - 1) * q
        lo = math.floor(h)
        v0, v1 = s[lo], s[min(lo + 1, n - 1)]
        hi = float(math.ceil(h))
        want = v0 if hi == float(lo) else (hi - h) * v0 + (h - float(lo)) * v1
        assert getattr(got, name) == want, name


# --------------------------------------------------------- triangle counting


def test_triangle_stats_random_gnp(spark):
    """Degree-oriented counting ≡ brute-force triple enumeration on a
    denser random graph than the unit fixture (hub-heavy)."""
    from mongo2mysql_spark.operators.triangles import node_triangle_stats

    rng = random.Random(31)
    n = 30
    edges = sorted(
        {
            tuple(sorted(rng.sample(range(n), 2)))
            for _ in range(260)
        }
    )
    eset = set(edges)
    tri = {i: 0 for i in range(n)}
    for a, b, c in itertools.combinations(range(n), 3):
        if ((a, b) in eset) and ((b, c) in eset) and ((a, c) in eset):
            for x in (a, b, c):
                tri[x] += 1
    deg = {i: 0 for i in range(n)}
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(edges, "id_1 long, id_2 long")
    got = {
        r.node: r for r in node_triangle_stats(nodes, pairs, "doc_id").collect()
    }
    for i in range(n):
        assert got[i].tri_count == tri[i], i
        assert got[i].degree == deg[i], i
        if deg[i] >= 2:
            want = (2.0 * tri[i]) / (float(deg[i]) * float(deg[i] - 1))
            assert got[i].clust_coeff == want, i


# ------------------------------------------------------------------- keyness


def test_keyness_matches_python_reference(spark):
    from mongo2mysql_spark.functions.text import tokens
    from mongo2mysql_spark.operators.keyness import keyness_terms

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(120):
        label = rng.choice(["a", "b", "c"])
        # over-represent a label-specific word
        special = {"a": "alpha", "b": "beta", "c": "gamma"}[label]
        toks = [rng.choice(vocab) for _ in range(20)] + [special] * rng.randint(0, 4)
        rng.shuffle(toks)
        rows.append((i, label, " ".join(toks)))
    min_count, min_ratio, k = 5, 2, 4

    cnt: dict = {}
    for _, label, text in rows:
        for t in text.split(" "):
            cnt[(label, t)] = cnt.get((label, t), 0) + 1
    tot_l: dict = {}
    n_all: dict = {}
    for (label, t), n in cnt.items():
        tot_l[label] = tot_l.get(label, 0) + n
        n_all[t] = n_all.get(t, 0) + n
    tot_all = sum(tot_l.values())
    expected = {}
    for label in tot_l:
        qual = []
        for (lb, t), n in cnt.items():
            if lb != label or n < min_count:
                continue
            n_rest = n_all[t] - n
            tot_rest = tot_all - tot_l[label]
            if n * tot_rest >= min_ratio * (n_rest + 1) * tot_l[label]:
                qual.append((-n, t))
        for rank, (negn, t) in enumerate(sorted(qual)[:k], 1):
            expected[(label, t)] = (-negn, rank)

    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        (r.label, r.token): (r.n, r.rank)
        for r in keyness_terms(
            df, "lang", tokens(F.col("text")),
            min_count=min_count, min_ratio=min_ratio, k=k,
        ).collect()
    }
    assert got == expected and got


# ------------------------------------------------ systematic weighted select


def test_systematic_select_matches_python_reference(spark):
    from mongo2mysql_spark.operators.sampling import (
        systematic_weighted_select,
    )

    rng = random.Random(53)
    weights = [rng.randint(0, 40) for _ in range(300)]
    total = sum(weights)
    k = 37
    cum = 0
    expected = {}
    for i, w in enumerate(weights):
        picks = ((cum + w) * k) // total - (cum * k) // total
        expected[i] = picks
        cum += w
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "doc_id long, w long"
    )
    got = {
        r.doc_id: r.picks
        for r in systematic_weighted_select(df, "w", "doc_id", k).collect()
    }
    assert got == expected
    assert sum(got.values()) == k


# --------------------------------------------------- seasonal backtest (MAE)


def test_seasonal_backtest_matches_python_reference(spark):
    from datetime import datetime, timedelta

    from mongo2mysql_spark.operators.forecast import seasonal_backtest

    rng = random.Random(7)
    base = datetime(2024, 5, 1)
    rows = []
    eid = 0
    for hour_idx in range(24 * 6):
        for _ in range(rng.randint(0, 3)):
            rows.append(
                (eid, base + timedelta(hours=hour_idx), rng.choice(["x", "y"]))
            )
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")

    # python reference over the same grid/split rules
    cnt: dict = {}
    hset = set()
    for _, ts, t in rows:
        h = int(ts.timestamp()) // 3600
        hset.add(h)
        cnt[(t, h)] = cnt.get((t, h), 0) + 1
    lo, hi = min(hset), max(hset)
    split_h = lo + ((hi - lo) * 3) // 4
    keys = {t for (t, _) in cnt}
    fit: dict = {}
    nh: dict = {}
    for t in keys:
        for h in range(lo, hi + 1):
            if h < split_h:
                fit[(t, h % 24)] = fit.get((t, h % 24), 0) + cnt.get((t, h), 0)
                nh[(t, h % 24)] = nh.get((t, h % 24), 0) + 1
    mae_ref = {}
    for t in keys:
        errs = [
            abs(cnt.get((t, h), 0) - fit[(t, h % 24)] / nh[(t, h % 24)])
            for h in range(split_h, hi + 1)
        ]
        mae_ref[t] = sum(errs) / len(errs)

    _, bt = seasonal_backtest(df, "event_type", "ts", 3, 4)
    got = {r.key: r.mae for r in bt.collect()}
    for t in keys:
        assert abs(got[t] - mae_ref[t]) < 1e-9, t  # ref sums in float order

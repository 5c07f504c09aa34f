"""Property tests for the round-9 wave-2/3 operators — seeded random
batches pitted against independent driver-side Python references (the
repo's style: few Spark jobs, each covering many random cases)."""

from __future__ import annotations

import math
import random
from collections import defaultdict
from datetime import datetime, timedelta
from fractions import Fraction

# ------------------------------------------------------------- OHLC bars


def test_ohlc_bars_random_vs_python(spark):
    from mongo2mysql_spark.operators.bars import ohlc_bars

    base = datetime(2024, 3, 1)
    rng = random.Random(101)
    rows = [
        (
            i,
            base + timedelta(seconds=rng.randrange(0, 2 * 86400)),
            rng.choice(["a", "b", "c"]),
            round(rng.uniform(-200, 200), 4),
        )
        for i in range(2000)
    ]
    got = {
        (r.key, r.bucket_start): (
            r.open_q, r.high_q, r.low_q, r.close_q, r.n_obs, r.sum_q
        )
        for r in ohlc_bars(
            spark.createDataFrame(
                rows, "event_id long, ts timestamp, event_type string, value double"
            ),
            "event_type", "ts", "value", "event_id",
        ).collect()
    }
    cells = defaultdict(list)
    for i, ts, k, v in rows:
        h = int(ts.timestamp()) // 3600
        cells[(k, datetime.utcfromtimestamp(h * 3600))].append(
            (ts, i, round(v * 1_000_000))
        )
    expect = {}
    for key, obs in cells.items():
        obs.sort()
        qs = [q for _, _, q in obs]
        expect[key] = (obs[0][2], max(qs), min(qs), obs[-1][2],
                       len(obs), sum(qs))
    got_n = {(k, b.replace(tzinfo=None)): v for (k, b), v in got.items()}
    assert got_n == expect


# --------------------------------------------------------- basket rules


def test_association_rules_random_vs_bruteforce(spark):
    from mongo2mysql_spark.operators.basket import association_rules

    rng = random.Random(103)
    baskets = {
        b: set(rng.sample(range(30), rng.randrange(1, 7)))
        for b in range(250)
    }
    rows = [(b, i) for b, items in baskets.items() for i in items]
    min_item, min_pair = 6, 2
    got = {
        (r.item_a, r.item_b): (r.n_a, r.n_b, r.n_ab, r.n_baskets)
        for r in association_rules(
            spark.createDataFrame(rows, "b long, i long"),
            "b", "i", min_item_count=min_item, min_pair_count=min_pair,
        ).collect()
    }
    item_n = defaultdict(int)
    for items in baskets.values():
        for i in items:
            item_n[i] += 1
    freq = {i for i, n in item_n.items() if n >= min_item}
    pair_n = defaultdict(int)
    for items in baskets.values():
        f = sorted(i for i in items if i in freq)
        for x in range(len(f)):
            for y in range(x + 1, len(f)):
                pair_n[(f[x], f[y])] += 1
    expect = {
        p: (item_n[p[0]], item_n[p[1]], n, len(baskets))
        for p, n in pair_n.items()
        if n >= min_pair
    }
    assert got == expect and len(got) > 3


# -------------------------------------------------------- collocations


def test_dice_collocations_random_vs_python(spark):
    from pyspark.sql import functions as F

    from mongo2mysql_spark.operators.collocations import dice_collocations

    rng = random.Random(107)
    vocab = [f"w{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 30)))
        for _ in range(250)
    ]
    got = {
        (r.w1, r.w2): (r.n_xy, r.n_x, r.n_y)
        for r in dice_collocations(
            spark.createDataFrame([(t,) for t in texts], "text string"),
            F.split(F.col("text"), " "),
            min_pair=4, min_dice_num=0, min_dice_den=1,
        ).collect()
    }
    uni = defaultdict(int)
    big = defaultdict(int)
    for t in texts:
        toks = t.split(" ")
        for w in toks:
            uni[w] += 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] += 1
    expect = {
        p: (n, uni[p[0]], uni[p[1]]) for p, n in big.items() if n >= 4
    }
    assert got == expect and len(got) > 10


# --------------------------------------------------------------- CUSUM


def test_cusum_random_multikey_vs_recurrence(spark):
    from mongo2mysql_spark.operators.drift import cusum_changepoints

    base = datetime(2024, 3, 1)
    rng = random.Random(109)
    rows = []
    series = defaultdict(list)
    eid = 0
    for k in ["a", "b"]:
        shift = rng.randrange(30, 70)
        for i in range(120):
            v = round(rng.uniform(0, 10) + (8 if i >= shift else 0), 3)
            rows.append((eid, base + timedelta(minutes=i), k, v))
            series[k].append((eid, round(v * 1_000_000)))
            eid += 1
    slack_q, thr_q = 1_000_000, 40_000_000
    got = {
        r.id: (r.cusum_s, r.is_alarm)
        for r in cusum_changepoints(
            spark.createDataFrame(
                rows, "event_id long, ts timestamp, k string, v double"
            ),
            ["k"], "v", "ts", "event_id",
            slack_q=slack_q, threshold_q=thr_q,
        ).collect()
    }
    expect = {}
    for k, obs in series.items():
        target = sum(q for _, q in obs) // len(obs)
        s = 0
        for i, q in obs:
            s = max(0, s + q - target - slack_q)
            expect[i] = (s, s > thr_q)
    assert got == expect
    assert any(a for _s, a in got.values())


# ---------------------------------------------------------------- TWAP


def test_twap_random_vs_python(spark):
    from mongo2mysql_spark.operators.bars import twap_bars

    base = datetime(2024, 3, 1)
    rng = random.Random(113)
    rows = [
        (
            i,
            base + timedelta(seconds=rng.randrange(0, 86400)),
            rng.choice(["a", "b"]),
            round(rng.uniform(-50, 50), 4),
        )
        for i in range(600)
    ]
    got = {
        (r.key, r.bucket_start.replace(tzinfo=None)): (
            int(r.twap_num), r.twap_den, r.n_obs
        )
        for r in twap_bars(
            spark.createDataFrame(
                rows, "event_id long, ts timestamp, event_type string, value double"
            ),
            "event_type", "ts", "value", "event_id",
        ).collect()
    }
    per_key = defaultdict(list)
    for i, ts, k, v in rows:
        per_key[k].append((int(ts.timestamp()), i, round(v * 1_000_000)))
    expect = {}
    for k, obs in per_key.items():
        obs.sort()
        agg = defaultdict(lambda: [0, 0, 0])  # num, den, n
        for j, (e, _i, q) in enumerate(obs):
            b = e // 3600
            end = (b + 1) * 3600
            nxt = obs[j + 1][0] if j + 1 < len(obs) else end
            w = min(nxt, end) - e
            cell = agg[(k, datetime.utcfromtimestamp(b * 3600))]
            cell[0] += w * q
            cell[1] += w
            cell[2] += 1
        for cell_key, (num, den, n) in agg.items():
            expect[cell_key] = (num, den, n)
    assert got == expect


# ---------------------------------------------------- grouped quantiles


def test_grouped_exact_quantiles_vs_sorted_reference(spark):
    """Independent of F.percentile: the sorted-array interpolation at
    h = (n−1)·q per group."""
    from mongo2mysql_spark.operators.selection import grouped_exact_quantiles

    rng = random.Random(127)
    rows = []
    for g, size in (("a", 701), ("b", 53), ("c", 2)):
        rows += [(g, round(rng.uniform(-300, 300), 2)) for _ in range(size)]
    qs = {"p10": 0.1, "p50": 0.5, "p95": 0.95}
    got = {
        r.g: tuple(r[n] for n in qs)
        for r in grouped_exact_quantiles(
            spark.createDataFrame(rows, "g string, v double"), ["g"], "v", qs
        ).collect()
    }
    by_g = defaultdict(list)
    for g, v in rows:
        by_g[g].append(v)
    expect = {}
    for g, vals in by_g.items():
        s = sorted(vals)
        n = len(s)
        out = []
        for q in qs.values():
            h = (n - 1) * q
            lo = math.floor(h)
            v0, v1 = s[lo], s[min(lo + 1, n - 1)]
            hi = float(math.ceil(h))
            out.append(
                v0 if hi == float(lo)
                else (hi - h) * v0 + (h - float(lo)) * v1
            )
        expect[g] = tuple(out)
    assert got == expect


# ------------------------------------------------------------ OLS trend


def test_hourly_trend_random_multikey_vs_fraction(spark):
    from mongo2mysql_spark.operators.trend import hourly_trend

    base = datetime(2024, 3, 1)
    rng = random.Random(131)
    rows = []
    counts = {}
    eid = 0
    for k in ["a", "b", "c"]:
        span = rng.randrange(20, 50)
        c = [rng.randrange(0, 6) for _ in range(span)]
        c[0] += 1
        c[-1] += 1
        counts[k] = c
        for hour, n in enumerate(c):
            for _ in range(n):
                rows.append((eid, base + timedelta(hours=hour, minutes=3), k))
                eid += 1
    got = {
        r.key: (int(r.slope_num), int(r.slope_den))
        for r in hourly_trend(
            spark.createDataFrame(
                rows, "event_id long, ts timestamp, event_type string"
            ),
            "event_type", "ts",
        ).collect()
    }
    for k, c in counts.items():
        n = len(c)
        sx = Fraction(n * (n - 1), 2)
        sx2 = Fraction((n - 1) * n * (2 * n - 1), 6)
        sy = Fraction(sum(c))
        sxy = Fraction(sum(i * v for i, v in enumerate(c)))
        num, den = got[k]
        assert Fraction(num, den) == (n * sxy - sx * sy) / (n * sx2 - sx * sx)

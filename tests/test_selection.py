"""Exact distributed quantile selection (operators/selection):
bit-equality with Spark's percentile aggregate, edge quantiles,
null handling, bucket-granularity invariance."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mongo2mysql_spark.operators.selection import exact_quantiles


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v double")


def test_bit_equal_to_percentile_random(spark):
    random.seed(13)
    vals = [random.uniform(-5e4, 1e6) for _ in range(4097)]
    df = _df(spark, vals)
    want = df.agg(
        F.percentile("v", 0.5).alias("p50"),
        F.percentile("v", 0.9).alias("p90"),
        F.percentile("v", 0.131).alias("p131"),
    ).collect()[0]
    got = exact_quantiles(
        df, "v", {"p50": 0.5, "p90": 0.9, "p131": 0.131}
    ).collect()[0]
    assert (got.p50, got.p90, got.p131) == (want.p50, want.p90, want.p131)


def test_duplicates_and_negative_buckets(spark):
    vals = [-3.5] * 10 + [-3.2] * 5 + [0.0] * 7 + [2.25] * 4
    df = _df(spark, vals)
    for q in (0.0, 0.25, 0.5, 0.77, 1.0):
        want = df.agg(F.percentile("v", q)).collect()[0][0]
        got = exact_quantiles(df, "v", {"x": q}).collect()[0].x
        assert got == want, q


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (2.0,), (None,), (3.0,)], "v double"
    )
    got = exact_quantiles(df, "v", {"med": 0.5}).collect()[0].med
    assert got == 2.0


def test_bucket_granularity_invariant(spark):
    random.seed(29)
    vals = [random.uniform(0, 100) for _ in range(500)]
    df = _df(spark, vals)
    coarse = exact_quantiles(
        df, "v", {"p": 0.63}, bucket_expr="FLOOR({c} / 25)"
    ).collect()[0].p
    fine = exact_quantiles(
        df, "v", {"p": 0.63}, bucket_expr="FLOOR({c} * 100)"
    ).collect()[0].p
    default = exact_quantiles(df, "v", {"p": 0.63}).collect()[0].p
    assert coarse == fine == default


def test_empty_and_validation(spark):
    df = spark.createDataFrame([], "v double")
    assert exact_quantiles(df, "v", {"p": 0.5}).collect()[0].p is None
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", {})
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", {"p": 1.5})


def test_equi_depth_histogram_conservation_and_oracle(spark, tmp_path):
    """Counts conserve, boundaries are the exact quantiles, and the
    DuckDB restatement matches bit-for-bit on a skewed column."""
    import random

    import duckdb

    from mongo2mysql_spark.operators.selection import (
        equi_depth_histogram,
        equi_depth_histogram_sql,
    )

    rng = random.Random(41)
    # Zipf-ish: a heavy value repeated, plus a smooth tail
    vals = [7.5] * 400 + [rng.uniform(0, 100) for _ in range(600)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    pq = str(tmp_path / "x.parquet")
    df.write.mode("overwrite").parquet(pq)
    got = sorted(
        tuple(r) for r in equi_depth_histogram(df, "x", 8).collect()
    )
    assert sum(r[3] for r in got) == len(vals)
    assert [r[0] for r in got] == list(range(8))
    duck = duckdb.connect()
    duck.execute(
        f"CREATE VIEW t AS SELECT * FROM parquet_scan('{pq}/*.parquet')"
    )
    sql = (
        "WITH "
        + equi_depth_histogram_sql("t", "x", 8)
        + " SELECT bucket, lo, hi, n_bucket FROM hist ORDER BY bucket"
    )
    want = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert got == want


def test_equi_depth_histogram_duplicate_boundaries_zero_fill(spark):
    from mongo2mysql_spark.operators.selection import equi_depth_histogram

    # one value dominates: several quantile boundaries coincide, so the
    # buckets between equal boundaries must be served with 0, not lost
    df = spark.createDataFrame(
        [(5.0,)] * 90 + [(1.0,), (9.0,)], "x double"
    )
    rows = equi_depth_histogram(df, "x", 4).collect()
    assert len(rows) == 4
    assert sum(r.n_bucket for r in rows) == 92
    assert any(r.n_bucket == 0 for r in rows)
    # half-open rule: every row's boundaries are monotone
    for r in rows:
        assert r.lo <= r.hi


@pytest.mark.slow
def test_equi_depth_histogram_counts_match_literal_chain(spark):
    """r13: counts are derived from the coarse histogram + one narrow
    straddle rescan instead of a full counting scan — they must equal
    the old literal-comparison-chain assignment EXACTLY, including on
    duplicate-heavy data where boundaries coincide with hot values."""
    import random

    from pyspark.sql import functions as F

    from mongo2mysql_spark.operators.selection import equi_depth_histogram

    rng = random.Random(1213)
    cases = [
        [7.5] * 400 + [rng.uniform(0, 100) for _ in range(600)],
        [5.0] * 90 + [1.0, 9.0],
        [float(i) for i in range(1, 33)],           # boundaries interpolated
        [0.25] * 10 + [0.75] * 10,                  # sub-integer: one FLOOR bucket
        [rng.gauss(0, 1) for _ in range(500)],      # negative buckets
    ]
    for n_buckets in (1, 4, 8):
        for vals in cases:
            df = spark.createDataFrame([(v,) for v in vals], "x double")
            got = {
                r["bucket"]: (r["lo"], r["hi"], r["n_bucket"])
                for r in equi_depth_histogram(df, "x", n_buckets).collect()
            }
            bounds = [got[i][0] for i in range(n_buckets)] + [
                got[n_buckets - 1][1]
            ]
            # the pre-r13 counting pass, verbatim
            v = F.col("x")
            assign = F.lit(n_buckets - 1)
            for i in reversed(range(n_buckets - 1)):
                assign = F.when(v < F.lit(bounds[i + 1]), F.lit(i)).otherwise(assign)
            chain = {
                r["b"]: r["n"]
                for r in df.filter(v.isNotNull())
                .groupBy(assign.cast("int").alias("b"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            for i in range(n_buckets):
                assert got[i][2] == chain.get(i, 0), (
                    f"bucket {i} of {n_buckets}: derived {got[i][2]} != "
                    f"chain {chain.get(i, 0)} (case len {len(vals)})"
                )


def test_equi_depth_histogram_empty_and_guard(spark):
    import pytest as _pytest

    from mongo2mysql_spark.operators.selection import equi_depth_histogram

    empty = spark.createDataFrame([], "x double")
    assert equi_depth_histogram(empty, "x", 4).count() == 0
    with _pytest.raises(ValueError):
        equi_depth_histogram(empty, "x", 0)


def test_grouped_exact_quantiles_bit_equal_builtin(spark):
    """The grouped histogram-locate-reread plan must equal
    F.percentile-under-groupBy BIT-for-bit — duplicates, negatives,
    skewed group sizes, and a singleton group included."""
    import random

    from pyspark.sql import functions as F

    from mongo2mysql_spark.operators.selection import grouped_exact_quantiles

    rng = random.Random(53)
    rows = []
    for g, size in (("a", 997), ("b", 40), ("c", 1), ("d", 3)):
        for _ in range(size):
            v = rng.choice(
                [rng.uniform(-500, 500), float(rng.randrange(-5, 5)), -7.25]
            )
            rows.append((g, v))
    df = spark.createDataFrame(rows, "g string, v double")
    qs = {"p01": 0.01, "p50": 0.5, "p90": 0.9, "p100": 1.0, "p0": 0.0}
    got = {
        r.g: tuple(r[n] for n in qs)
        for r in grouped_exact_quantiles(df, ["g"], "v", qs).collect()
    }
    want = {
        r.g: tuple(r[n] for n in qs)
        for r in df.groupBy("g")
        .agg(*[F.percentile("v", q).alias(n) for n, q in qs.items()])
        .collect()
    }
    assert got == want and set(got) == {"a", "b", "c", "d"}


def test_grouped_exact_quantiles_nulls_and_granularity(spark):
    from pyspark.sql import functions as F

    from mongo2mysql_spark.operators.selection import grouped_exact_quantiles

    rows = [("a", 1.0), ("a", None), ("a", 3.0), ("b", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r.g: r.med
        for r in grouped_exact_quantiles(
            df, ["g"], "v", {"med": 0.5}
        ).collect()
    }
    # nulls ignored; the all-null group is simply absent
    assert got == {"a": 2.0}
    # a coarser bucket expression changes nothing but the second-pass
    # selectivity
    got2 = {
        r.g: r.med
        for r in grouped_exact_quantiles(
            df, ["g"], "v", {"med": 0.5}, bucket_expr="FLOOR({c} / 100)"
        ).collect()
    }
    assert got2 == got


def test_mad_outliers_planted_and_degenerate(spark):
    """A planted spike is flagged, the median doesn't move (robustness
    — a mean/std rule at the same k would also fire, but MAD's
    operands ignore the spike entirely), and a constant-majority
    series reports degenerate instead of a vacuous verdict."""
    from mongo2mysql_spark.operators.anomaly import mad_outliers

    rows = (
        [(i, "s", float(10 + (i % 5))) for i in range(40)]
        + [(99, "s", 500.0)]                     # the spike
        + [(i, "c", 3.0) for i in range(100, 130)]
        + [(999, "c", 4.0)]                      # lone deviation, mad=0
    )
    df = spark.createDataFrame(rows, "event_id long, k string, v double")
    out = {
        r.event_id: r
        for r in mad_outliers(df, ["k"], "v", ["event_id"], k=5).collect()
    }
    assert out[99].is_mad_outlier and not out[99].is_degenerate
    assert out[99].med == 12.0  # spike did not drag the median
    flagged = [e for e, r in out.items() if r.is_mad_outlier]
    assert flagged == [99]
    # constant-majority series: mad = 0 -> degenerate, never outlier
    assert out[999].is_degenerate and not out[999].is_mad_outlier
    assert out[999].mad == 0.0 and out[999].abs_dev == 1.0


def test_rescan_predicate_reaches_parquet_scan(spark, tmp_path):
    """The phase-2 rescan filter is expressed on the RAW column as an
    OR of observed [min, max] ranges, so it converts to parquet
    PushedFilters (row-group pruning) — the r9 VERDICT finding: a
    FLOOR(col)-IN(...) filter evaluates post-scan and re-reads the
    whole column."""
    from mongo2mysql_spark.operators.selection import rescan_predicate

    p = str(tmp_path / "vals")
    _df(spark, [float(i) for i in range(1000)]).write.parquet(p)
    scan = spark.read.parquet(p).filter(
        rescan_predicate("v", [(12.0, 13.5), (800.0, 801.25)])
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(v,12.0)" in plan
    assert "LessThanOrEqual(v,13.5)" in plan
    # and the filter is exact: only the in-range rows survive
    got = sorted(r["v"] for r in scan.collect())
    assert got == [12.0, 13.0, 800.0, 801.0]
    with pytest.raises(ValueError):
        rescan_predicate("v", [])


def test_exact_quantiles_bit_equal_on_parquet_source(spark, tmp_path):
    """End-to-end on a real parquet source (the pushdown path the plan
    test asserts): still bit-identical to F.percentile."""
    random.seed(77)
    vals = [random.uniform(-100.0, 100.0) for _ in range(2000)]
    p = str(tmp_path / "pq")
    _df(spark, vals).write.parquet(p)
    df = spark.read.parquet(p)
    want = df.agg(
        F.percentile("v", 0.25).alias("q25"),
        F.percentile("v", 0.975).alias("q975"),
    ).collect()[0]
    got = exact_quantiles(df, "v", {"q25": 0.25, "q975": 0.975}).collect()[0]
    assert got["q25"] == want["q25"]
    assert got["q975"] == want["q975"]


def test_equi_depth_histogram_sql_single_bucket(spark):
    """n_buckets == 1 must be valid in BOTH restatements (the r9
    ADVICE boundary divergence: the SQL helper emitted an empty WHEN
    chain, a DuckDB parse error)."""
    import duckdb

    from mongo2mysql_spark.operators.selection import (
        equi_depth_histogram,
        equi_depth_histogram_sql,
    )

    vals = [float(i) for i in range(50)]
    df_rows = equi_depth_histogram(_df(spark, vals), "v", n_buckets=1).collect()
    assert len(df_rows) == 1 and df_rows[0]["n_bucket"] == 50

    con = duckdb.connect()
    con.execute("CREATE TABLE src AS SELECT unnest(range(50)) * 1.0 AS v")
    cte = equi_depth_histogram_sql("src", "v", n_buckets=1)
    sql_rows = con.execute(
        f"WITH {cte} SELECT * FROM hist ORDER BY bucket"
    ).fetchall()
    assert len(sql_rows) == 1 and sql_rows[0][3] == 50
    assert df_rows[0]["lo"] == sql_rows[0][1]
    assert df_rows[0]["hi"] == sql_rows[0][2]
    with pytest.raises(ValueError):
        equi_depth_histogram_sql("src", "v", n_buckets=0)


def test_grouped_quantiles_all_null_group_survives_left_join(spark):
    """A group whose measured column is entirely NULL has no quantile
    row; consumers (agg_stats_by_returnflag) LEFT-join so the group
    survives with NULL percentiles instead of vanishing (r9 ADVICE)."""
    from mongo2mysql_spark.operators.selection import grouped_exact_quantiles

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", None)], "k string, v double"
    )
    base = df.groupBy("k").count()
    q = grouped_exact_quantiles(df, ["k"], "v", {"p50": 0.5})
    out = {r["k"]: r["p50"] for r in base.join(q, "k", "left").collect()}
    assert set(out) == {"a", "b"}
    assert out["a"] == 2.0 and out["b"] is None


def test_selectivity_estimate_tracks_exact_and_edges(spark):
    """Equi-depth-based range selectivity: near-exact on uniform data,
    clamps outside the domain, and full-domain ranges estimate ~N."""
    from mongo2mysql_spark.operators.selection import selectivity_estimate

    vals = [float(i) for i in range(1000)]
    df = _df(spark, vals)
    got = {
        r["label"]: (r["est"], r["exact"])
        for r in selectivity_estimate(
            df,
            "v",
            [
                (0.0, 250.0, "q1"),
                (250.0, 750.0, "mid"),
                (2000.0, 3000.0, "outside"),
                (-100.0, 5000.0, "all"),
            ],
            n_buckets=8,
        ).collect()
    }
    assert got["outside"] == (0.0, 0)
    assert got["all"][1] == 1000 and abs(got["all"][0] - 1000) < 1e-6
    # uniform data: estimates within a bucket's mass of exact
    assert abs(got["q1"][0] - got["q1"][1]) <= 125 + 1
    assert abs(got["mid"][0] - got["mid"][1]) <= 250 + 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        selectivity_estimate(df, "v", [])

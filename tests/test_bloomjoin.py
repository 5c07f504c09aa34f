"""Bloom join pruning (operators/bloomjoin.py): filter-contents and
pass-set DuckDB parity, the no-false-negative guarantee, a sane
false-positive rate at the slot's parameters, and join-result
invariance under the prefilter."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from tests.oracle_utils import compare


def _frames(spark, tmp_path):
    build = spark.createDataFrame(
        [(k,) for k in range(1, 301)], "bk long"
    )
    probe = spark.createDataFrame(
        [(i, i % 1500 + 1) for i in range(4000)], "pid long, pk long"
    )
    paths = {}
    for name, df in (("bjb", build), ("bjp", probe)):
        p = str(tmp_path / name)
        df.write.parquet(p)
        paths[name] = p
    return build, probe, paths


def test_bloom_words_and_pass_match_duckdb(spark, tmp_path):
    from mongo2mysql_spark.operators.bloomjoin import (
        bloom_build,
        bloom_might_contain,
        bloom_words_array,
        sql_bloom_build,
        sql_bloom_filter,
    )

    build, probe, paths = _frames(spark, tmp_path)
    con = duckdb.connect()
    for name, p in paths.items():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM"
            f" read_parquet('{p}/*.parquet')"
        )
    m_words, k = 64, 3
    words_df = bloom_build(build, "bk", m_words, k)
    build_sql = sql_bloom_build("bjb", "bk", m_words, k)
    assert not compare(
        words_df, con, f"WITH {build_sql} SELECT * FROM bjwords"
    )
    words = bloom_words_array(words_df, m_words)
    passed = probe.filter(
        bloom_might_contain(F.col("pk"), words, k)
    ).select("pid", "pk")
    filt_sql = sql_bloom_filter("bjp", "pk", m_words, k)
    assert not compare(
        passed, con,
        f"WITH {build_sql}, {filt_sql}"
        f" SELECT pid, pk FROM bjpass",
    )


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    from mongo2mysql_spark.operators.bloomjoin import (
        bloom_build,
        bloom_might_contain,
        bloom_words_array,
    )

    build = spark.createDataFrame(
        [(k,) for k in range(1, 3001)], "bk long"
    )
    m_words, k = 512, 3
    words = bloom_words_array(
        bloom_build(build, "bk", m_words, k), m_words
    )
    # every build key passes its own filter — NO false negatives
    assert (
        build.filter(bloom_might_contain(F.col("bk"), words, k)).count()
        == 3000
    )
    # disjoint keys pass only as false positives, at a sane rate for
    # 3k keys in 512*62 bits with k=3 (analytic fpp ~1.5%)
    alien = spark.createDataFrame(
        [(k,) for k in range(100_001, 104_001)], "bk long"
    )
    fp = alien.filter(
        bloom_might_contain(F.col("bk"), words, k)
    ).count()
    assert fp / 4000 < 0.10, fp


def test_bloom_prefilter_preserves_join_result(spark):
    from mongo2mysql_spark.operators.bloomjoin import (
        bloom_build,
        bloom_might_contain,
        bloom_words_array,
    )

    build = spark.createDataFrame(
        [(k, k * 10) for k in range(1, 201)], "bk long, attr long"
    )
    probe = spark.createDataFrame(
        [(i, i % 900 + 1, i * 3) for i in range(5000)],
        "pid long, pk long, v long",
    )
    m_words, k = 64, 3
    words = bloom_words_array(
        bloom_build(build, "bk", m_words, k), m_words
    )
    plain = probe.join(build, F.col("pk") == F.col("bk"))
    pre = probe.filter(
        bloom_might_contain(F.col("pk"), words, k)
    ).join(build, F.col("pk") == F.col("bk"))
    cols = sorted(plain.columns)
    assert sorted(map(tuple, pre.select(*cols).collect())) == sorted(
        map(tuple, plain.select(*cols).collect())
    )
    # and the prefilter genuinely prunes (900-key probe domain vs
    # 200-key build domain → most probe rows drop before the join)
    n_pass = probe.filter(
        bloom_might_contain(F.col("pk"), words, k)
    ).count()
    assert n_pass < 5000 * 0.4, n_pass

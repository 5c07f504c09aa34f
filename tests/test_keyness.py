"""Keyness terms (operators/keyness): planted over-represented
vocabulary, smoothing for label-exclusive terms, integer selection,
DuckDB-restatement equality."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from mongo2mysql_spark.functions.text import tokens
from mongo2mysql_spark.operators.keyness import keyness_sql, keyness_terms


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_planted_distinctive_terms(spark):
    # 'finance' docs repeat 'bond'; shared filler is everywhere; the
    # 'bio' label repeats 'axon'.  Filler must NOT qualify.
    fin = "bond " * 10 + "the and of common words here"
    bio = "axon " * 10 + "the and of common words here"
    rows = [(i, "finance", fin) for i in range(5)] + [
        (i + 10, "bio", bio) for i in range(5)
    ]
    got = {
        (r.label, r.token): (r.n, r.n_rest, r.rank)
        for r in keyness_terms(
            _docs(spark, rows), "lang", tokens(F.col("text")),
            min_count=5, min_ratio=3, k=5,
        ).collect()
    }
    assert ("finance", "bond") in got and got[("finance", "bond")][0] == 50
    assert got[("finance", "bond")][1] == 0  # label-exclusive
    assert ("bio", "axon") in got
    assert all(tok not in ("the", "and", "of") for (_, tok) in got)


def test_keyness_value_is_smoothed_ratio(spark):
    rows = [(0, "a", "x x x x x y"), (1, "b", "y y y y y y")]
    res = {
        r.token: r
        for r in keyness_terms(
            _docs(spark, rows), "lang", tokens(F.col("text")),
            min_count=5, min_ratio=2, k=5,
        ).collect()
    }
    # 'x': n=5 of tot_l=6 in 'a'; rest: 0 of 6 — expected value follows
    # the exact IEEE op order of the implementation: (5/6)/((0+1)/6)
    assert res["x"].label == "a"
    assert res["x"].keyness == (5 / 6) / ((0 + 1) / 6)


def test_precomputed_counts_match_inline_path(spark):
    # the r12 tf/keyness fusion: a caller-supplied (label, token, n)
    # aggregate must serve the exact rows the inline explode path does,
    # and the tf readout derived from the same aggregate must equal the
    # direct corpus-wide count.
    rows = [
        (0, "a", "alpha alpha alpha alpha alpha beta common common"),
        (1, "a", "alpha alpha alpha alpha alpha common common common"),
        (2, "b", "gamma gamma gamma gamma gamma common common common"),
        (3, "b", "delta common common delta delta delta delta common"),
    ]
    d = _docs(spark, rows)
    cnt = (
        d.select(
            F.col("lang").alias("label"),
            F.explode(tokens(F.col("text"))).alias("token"),
        )
        .groupBy("label", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    inline = sorted(
        tuple(r)
        for r in keyness_terms(
            d, "lang", tokens(F.col("text")), min_count=4, min_ratio=2, k=3
        ).collect()
    )
    served = sorted(
        tuple(r)
        for r in keyness_terms(
            d, "lang", tokens(F.col("text")), min_count=4, min_ratio=2, k=3,
            counts=cnt,
        ).collect()
    )
    assert inline == served and inline
    tf_direct = sorted(
        tuple(r)
        for r in d.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    tf_fused = sorted(
        tuple(r)
        for r in cnt.groupBy("token").agg(F.sum("n").alias("n")).collect()
    )
    assert tf_direct == tf_fused


def test_sql_restatement_matches(spark):
    rows = [
        (0, "a", "alpha alpha alpha alpha alpha beta common common"),
        (1, "a", "alpha alpha alpha alpha alpha common common common"),
        (2, "b", "gamma gamma gamma gamma gamma common common common"),
        (3, "b", "delta common common delta delta delta delta common"),
    ]
    got = sorted(
        tuple(r)
        for r in keyness_terms(
            _docs(spark, rows), "lang", tokens(F.col("text")),
            min_count=4, min_ratio=2, k=3,
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{l}', '{t}')" for i, l, t in rows)
        + ") t(doc_id, lang, text)"
    )
    sql = (
        "WITH "
        + keyness_sql(
            "documents", "lang", "string_split(text, ' ')",
            min_count=4, min_ratio=2, k=3,
        )
        + " SELECT label, token, n, n_rest, keyness, rank FROM keytop"
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want and got  # non-trivial

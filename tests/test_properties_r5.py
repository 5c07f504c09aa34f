"""Property tests for the round-5 curation operators — seeded random
batches asserted in ONE Spark job each (the repo's 5-seeded-batch
style; per-example jobs would be prohibitively slow)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from mongo2mysql_spark.operators.c4 import c4_clean
from mongo2mysql_spark.operators.urls import normalize_url
from mongo2mysql_spark.functions.text import luhn_valid


def test_normalize_url_idempotent(spark):
    """normalize(normalize(u)) == normalize(u) over fuzzed URLs — the
    canonical-form contract a dedup key needs."""
    rng = random.Random(20260814)
    schemes = ["", "http://", "https://", "HTTP://", "ftp://"]
    hosts = ["Example.COM", "www.example.com", "a.B.example.org", "WWW.X.IO"]
    paths = ["", "/", "/A/b", "/a/b/", "/CaseSensitive///"]
    queries = [
        "", "?a=1", "?utm_source=x", "?b=2&a=1", "?a=1&utm_campaign=z&fbclid=q",
        "?ref=home&id=7",
    ]
    frags = ["", "#x", "#sec?fake=1"]
    urls = [
        rng.choice(schemes) + rng.choice(hosts) + rng.choice(paths)
        + rng.choice(queries) + rng.choice(frags)
        for _ in range(400)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = normalize_url(F.col("u"))
    bad = (
        df.select(once.alias("n1"))
        .select("n1", normalize_url(F.col("n1")).alias("n2"))
        .filter("n1 != n2")
    )
    assert bad.count() == 0


def test_luhn_exactly_one_check_digit(spark):
    """For any digit prefix, exactly one of the ten possible final
    digits makes the number Luhn-valid — the defining property of a
    check digit."""
    rng = random.Random(7)
    prefixes = [
        "".join(rng.choice("0123456789") for _ in range(rng.randint(11, 17)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(p,) for p in prefixes], "p string")
    valid_count = sum(
        F.when(luhn_valid(F.concat(F.col("p"), F.lit(str(d)))), 1).otherwise(0)
        for d in range(10)
    )
    assert df.select(valid_count.alias("n")).filter("n != 1").count() == 0


def test_c4_clean_idempotent_on_kept_text(spark):
    """Re-cleaning a cleaned page keeps everything: kept lines survive
    a second pass verbatim (the rules are closed over their output)."""
    rng = random.Random(99)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "kappa"]

    def line():
        body = " ".join(rng.choice(words) for _ in range(rng.randint(1, 8)))
        tail = rng.choice([".", "!", "?", "", " ", "..."])
        junk = rng.choice(["", "", "", "javascript", "{"])
        return (body + " " + junk).strip() + tail

    pages = [
        (i, "\n".join(line() for _ in range(rng.randint(1, 12))))
        for i in range(300)
    ]
    df = spark.createDataFrame(pages, "doc_id long, text string")
    once = c4_clean(df).select("doc_id", F.col("clean_text").alias("text"))
    twice = c4_clean(once).select(
        "doc_id", "clean_text", "n_lines", "n_lines_kept"
    )
    joined = once.join(twice, "doc_id")
    assert joined.filter("text != clean_text").count() == 0
    # every line of a cleaned page passes the line rules again
    assert twice.filter("n_lines_kept != n_lines").filter(
        # empty page: split('') gives one '' line that (correctly) fails
        "clean_text != ''"
    ).count() == 0


def test_strip_html_cross_engine_parity_fuzzed(spark):
    """Random tag soup through both extractors — any Java-regex vs RE2
    divergence in the strip chain would hash-fail the driver's 'html'
    branch, so hunt for it here first.  One Spark job + one DuckDB
    scan over 300 generated pages."""
    import duckdb

    from mongo2mysql_spark.operators.html import (
        sql_extract_title,
        sql_strip_html,
        strip_html,
        extract_title,
    )

    rng = random.Random(424242)
    frags = [
        "plain words", "<b>bold", "</b>", "<div>", "</div>", "<DIV >x</DIV>",
        "<script>var x='</div>';</script>", "<style>.a{b:c}</style>",
        "<!-- note -->", "<br>", "<BR/>", "<p class='x'>para</p>",
        "&amp;", "&lt;tag&gt;", "&quot;", "&#39;", "&nbsp;", "&amp;lt;",
        "a < b > c", "<head><title>T1</title></head>",
        "<title>Second</title>", "\n", "  ", "\t", "<ul><li>i</li></ul>",
        "<h2>head</h2>", "<td>c</td></tr>", "<hr >", "<em", "em>",
        "<p>unclosed", "<<double<<", ">>",
    ]
    pages = [
        "".join(rng.choice(frags) for _ in range(rng.randint(1, 25)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(i, p) for i, p in enumerate(pages)],
                               "i long, h string")
    got = {
        r.i: (r.v, r.t)
        for r in df.select(
            "i",
            strip_html(F.col("h")).alias("v"),
            extract_title(F.col("h")).alias("t"),
        ).collect()
    }
    con = duckdb.connect()
    for i, p in enumerate(pages):
        dv, dt = con.execute(
            f"SELECT {sql_strip_html('h')}, {sql_extract_title('h')} "
            "FROM (SELECT ? AS h)",
            [p],
        ).fetchone()
        assert got[i] == (dv, dt), (p, got[i], (dv, dt))


def test_normalize_url_cross_engine_parity_fuzzed(spark):
    """Spark normalize_url vs its DuckDB mirror (sql_normalize_url —
    the url_norm oracle's source of truth) over fuzzed URLs: any
    divergence would hash-fail the driver's url branches."""
    import duckdb

    from mongo2mysql_spark.operators.urls import sql_normalize_url

    rng = random.Random(31337)
    pieces = {
        "scheme": ["", "http://", "HTTPS://", "ftp://", "x-app+v1://"],
        "www": ["", "www.", "WWW.", "wWw."],
        "host": ["Example.COM", "a.b.C.io", "localhost", "x", "9.9.9.9"],
        "path": ["", "/", "/a", "/A/B/c", "/x//y///", "/%20z"],
        "query": ["", "?", "?a", "?a=1", "?B=2&a=1&a=0", "?utm_x=1&ID=2",
                  "?fbclid=9", "?=v", "?a&&b=1",
                  # literal '?' inside query values: Spark splits with
                  # limit=2 (keeps the tail), the mirror must match
                  "?b=1?c=2", "?x=a?b&y=1", "??"],
        "frag": ["", "#", "#f", "#a?b=1&utm_y=2"],
    }
    urls = [
        "".join(rng.choice(pieces[k]) for k in
                ("scheme", "www", "host", "path", "query", "frag"))
        for _ in range(400)
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i long, u string")
    from mongo2mysql_spark.operators.urls import normalize_url

    got = {r.i: r.n for r in df.select("i", normalize_url(F.col("u")).alias("n")).collect()}
    con = duckdb.connect()
    for i, u in enumerate(urls):
        want = con.execute(
            f"SELECT {sql_normalize_url('u')} FROM (SELECT ? AS u)", [u]
        ).fetchone()[0]
        assert got[i] == want, (u, got[i], want)

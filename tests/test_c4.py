"""C4-style line-level structural cleaning (operators/c4.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo2mysql_spark.operators.c4 import c4_clean, c4_keep

GOOD = "\n".join(
    [
        "This is a perfectly fine prose sentence.",
        "Here is another good line with many words!",
        'A quoted ending also counts as terminal."',
        "Questions are prose too, are they not?",
        "And a fifth full sentence to clear the page minimum.",
    ]
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_line_rules(spark):
    page = "\n".join(
        [
            "Kept line number one is right here.",
            "no terminal punctuation on this line",
            "Short one.",  # < 3 words
            "Please enable JavaScript to continue browsing.",  # boilerplate
            "Check our cookie policy for details.",  # boilerplate
            "Read the terms of use before continuing.",  # boilerplate
            "Another kept line closes the page.",
        ]
    )
    out = c4_clean(_docs(spark, [(1, page)])).collect()[0]
    assert out.n_lines == 7
    assert out.n_lines_kept == 2
    assert out.clean_text == (
        "Kept line number one is right here.\nAnother kept line closes the page."
    )
    assert not out.page_kept  # only 2 surviving lines < 5


def test_page_rules(spark):
    rows = [
        (1, GOOD),
        (2, GOOD + "\nSome lorem ipsum placeholder text appears here."),
        (3, GOOD + "\nfunction f() { return 1; }"),
        (4, "Only one good sentence here today."),
    ]
    out = {r.doc_id: r for r in c4_clean(_docs(spark, rows)).collect()}
    assert out[1].page_kept
    assert not out[2].page_kept  # lorem ipsum anywhere kills the page
    assert not out[3].page_kept  # '{' anywhere kills the page
    assert not out[4].page_kept  # < 5 surviving lines
    # the brace line itself also fails the line rules (no terminal punct)
    assert out[3].n_lines_kept == 5


def test_c4_keep_filters_and_rewrites(spark):
    rows = [
        (1, GOOD + "\njunk line without punctuation"),
        (2, GOOD + "\nlorem ipsum."),
        (3, "Too short."),
    ]
    df = _docs(spark, rows).withColumn("source", F.lit("s"))
    kept = c4_keep(df).collect()
    assert [r.doc_id for r in kept] == [1]
    assert kept[0].text == GOOD  # junk line stripped in place
    assert kept[0].source == "s"  # other columns carried through


def test_whitespace_tolerance(spark):
    # trailing spaces must not defeat the terminal-punctuation rule
    page = "\n".join(["Trailing space after the period.  "] * 5)
    out = c4_clean(_docs(spark, [(1, page)])).collect()[0]
    assert out.n_lines_kept == 5
    assert out.page_kept

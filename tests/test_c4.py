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


def test_word_blocklist_page_rule_word_boundary(spark):
    """The bad-words page rule matches word-boundary tokens, never
    substrings (C4 §2.2: 'class' must survive an 'ass' blocklist), is
    case-insensitive, and composes into c4_keep as a kwarg; an empty
    blocklist changes nothing."""
    from mongo2mysql_spark.operators.c4 import c4_clean, c4_keep

    good_line = "This sentence has plenty of words and ends properly."
    page = lambda extra: "\n".join([good_line] * 5 + [extra])  # noqa: E731
    rows = [
        (0, page("The class went well and everyone learned lots today.")),
        (1, page("What an ASS he made of himself at the meeting there.")),
        (2, page("Nothing objectionable appears anywhere in this text.")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.page_kept
        for r in c4_clean(df, word_blocklist=("ass",)).collect()
    }
    assert got == {0: True, 1: False, 2: True}
    # empty blocklist: identical to the default rule set
    base = {r.doc_id: r.page_kept for r in c4_clean(df).collect()}
    noop = {
        r.doc_id: r.page_kept for r in c4_clean(df, word_blocklist=()).collect()
    }
    assert noop == base == {0: True, 1: True, 2: True}
    kept_ids = {
        r.doc_id for r in c4_keep(df, word_blocklist=("ass",)).collect()
    }
    assert kept_ids == {0, 2}


def test_word_blocklist_multiword_phrases(spark):
    """Multi-word / punctuated blocklist entries (common in the LDNOOBW
    list the C4 recipe cites) must match as word-boundary PHRASES —
    token-for-token matching silently ignored them (ADVICE r6) — while
    substrings inside larger words still never match."""
    from mongo2mysql_spark.operators.c4 import word_blocklist_expr

    rows = [
        (0, "they sell blue pills cheap here"),        # phrase present
        (1, "the bluebird pillow was comfortable"),    # substring only
        (2, "blue  pills, with odd spacing count"),    # other separator
        (3, "BLUE PILLS uppercase should match too"),
        (4, "nothing of note in this sentence"),
        (5, "the word ass alone still matches"),       # single entry
        (6, "but classic assessment does not"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ok = df.select(
        "doc_id",
        word_blocklist_expr(F.col("text"), ("blue pills", "ass")).alias("ok"),
    ).collect()
    got = {r.doc_id: r.ok for r in ok}
    assert got == {0: False, 1: True, 2: False, 3: False, 4: True,
                   5: False, 6: True}

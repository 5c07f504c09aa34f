"""HTML → visible text extraction (operators/html.py)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from mongo2mysql_spark.operators.html import (
    extract_title,
    sql_extract_title,
    sql_strip_html,
    strip_html,
)

PAGE = (
    "<html><head><title> My Page </title><script>var x=1;</script>"
    "<style>.c{}</style></head>\n"
    "<body><!-- c --><h1>Head &amp; Tail</h1>"
    "<p>First  para with &lt;tag&gt; text.</p><div>Second&nbsp;block</div>\n"
    "<ul><li>item one</li><li>item two</li></ul><br>after break</body></html>"
)


def _spark_strip(spark, html: str) -> tuple[str, str]:
    row = (
        spark.createDataFrame([(html,)], "h string")
        .select(
            strip_html(F.col("h")).alias("v"), extract_title(F.col("h")).alias("t")
        )
        .collect()[0]
    )
    return row.v, row.t


def test_strip_html_visible_text(spark):
    v, t = _spark_strip(spark, PAGE)
    assert t == "My Page"
    assert v == (
        "Head & Tail\nFirst para with <tag> text.\n"
        "Second block\nitem one\nitem two\nafter break"
    )


def test_script_case_and_multiline(spark):
    page = "<BODY><SCRIPT type='x'>\nevil()\n</SCRIPT>ok <I>text</I></BODY>"
    v, _ = _spark_strip(spark, page)
    assert v == "ok text"


def test_no_title_and_plain_text(spark):
    v, t = _spark_strip(spark, "just plain text, no markup")
    assert t == ""
    assert v == "just plain text, no markup"


def test_entity_order(spark):
    # '&amp;lt;' is the LITERAL text '&lt;', not a '<'
    v, _ = _spark_strip(spark, "<p>a &amp;lt; b</p>")
    assert v == "a &lt; b"


def test_cross_engine_parity(spark):
    """Spark (Java regex) and DuckDB (RE2) must extract byte-identical
    text — the contract the driver 'html' branch hash relies on."""
    pages = [
        PAGE,
        "<div>unclosed <b>bold",
        "nested <div><div>deep</div>x</div> tail",
        "<head><title>t</title></head>body &quot;q&quot; &#39;s&#39;",
        "spaces   and\ttabs<br><br>\n\n\nmany breaks",
        "",
    ]
    con = duckdb.connect()
    for page in pages:
        sv, st = _spark_strip(spark, page)
        dv, dt = con.execute(
            f"SELECT {sql_strip_html('h')}, {sql_extract_title('h')} "
            "FROM (SELECT ? AS h)",
            [page],
        ).fetchone()
        assert sv == dv, (page, sv, dv)
        assert st == dt, (page, st, dt)

"""HTML → visible-text extraction (extension layer).

The stage BEFORE every web-corpus curation step: CommonCrawl-derived
pipelines (C4, CCNet, RefinedWeb, Dolma) all begin by reducing raw
HTML to visible text (their production extractors — jusText,
trafilatura, resiliparse — are structural variants of the same core:
drop non-content machinery, turn block boundaries into line breaks,
strip tags, decode entities).  This module is that core as a chain of
JVM regexp/replace column expressions — no UDF, no parser library —
which is exactly what survives 100 TB: the whole extraction fuses into
the scan projection.

Pipeline (strip_html):

1. drop comments, <script>…</script>, <style>…</style>, the whole
   <head> (title is recoverable separately via extract_title);
2. block-level boundaries (<br>, </p>, </div>, </h1-6>, </li>, </tr>,
   </table>, </ul>, </ol>) become newlines, so downstream line-level
   rules (operators/c4.py) see the page's visual line structure;
3. every remaining tag is dropped;
4. the five predefined XML/HTML entities + &nbsp; are decoded
   (&amp; LAST so '&amp;lt;' decodes to the literal '&lt;');
5. whitespace is normalized (space runs, space around newlines,
   newline runs, outer trim).

Regex dialect: the Java/RE2 shared subset (inline (?is) flags, lazy
quantifiers, character classes — no backreferences, no lookaround), so
the DuckDB oracle runs the SAME patterns with its RE2 engine and the
driver hash-verifies the extracted text byte-for-byte
(queries/text.py 'html' branch).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) chain — order matters; every pattern is
# RE2-compatible so the oracle replays the chain verbatim
STRIP_STEPS: tuple[tuple[str, str], ...] = (
    (r"(?s)<!--.*?-->", ""),
    (r"(?is)<script[^>]*>.*?</script>", ""),
    (r"(?is)<style[^>]*>.*?</style>", ""),
    (r"(?is)<head[^>]*>.*?</head>", ""),
    (r"(?i)<(?:br|hr)[^>]*>", "\n"),
    (r"(?i)</(?:p|div|h[1-6]|li|tr|table|ul|ol)[^>]*>", "\n"),
    (r"<[^>]*>", ""),
)

# literal entity decodes — &amp; last (see module docstring)
ENTITY_STEPS: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

WHITESPACE_STEPS: tuple[tuple[str, str], ...] = (
    (r"[ \t]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n+", "\n"),
    (r"^[\n ]+", ""),  # edge trim via anchors: identical semantics in
    (r"[\n ]+$", ""),  # both engines (plain trim() differs on newlines)
)


def strip_html(html: Column) -> Column:
    """Visible text of an HTML document (see module docstring)."""
    out = html
    for pat, repl in STRIP_STEPS:
        out = F.regexp_replace(out, pat, repl)
    for lit, repl in ENTITY_STEPS:
        out = F.replace(out, F.lit(lit), F.lit(repl))
    for pat, repl in WHITESPACE_STEPS:
        out = F.regexp_replace(out, pat, repl)
    return out


def extract_title(html: Column) -> Column:
    """<title> text (first occurrence, trimmed; '' when absent).
    Runs BEFORE strip_html in a pipeline — stripping drops the head."""
    return F.trim(F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title>", 1))


def sql_strip_html(expr: str) -> str:
    """DuckDB restatement of strip_html over SQL expression ``expr`` —
    the same pattern chain through RE2 with the 'g' (global) option;
    used by the oracle so both engines extract independently."""
    def rx(out: str, pat: str, repl: str) -> str:
        p = pat.replace("'", "''")
        r = repl.replace("\n", "' || chr(10) || '")
        return f"regexp_replace({out}, '{p}', '{r}', 'g')"

    out = expr
    for pat, repl in STRIP_STEPS:
        out = rx(out, pat, repl)
    for lit, repl in ENTITY_STEPS:
        out = f"replace({out}, '{lit}', '{repl.replace(chr(39), chr(39) * 2)}')"
    for pat, repl in WHITESPACE_STEPS:
        out = rx(out, pat, repl)
    return out


def sql_extract_title(expr: str) -> str:
    """DuckDB restatement of extract_title."""
    return f"trim(regexp_extract({expr}, '(?is)<title[^>]*>(.*?)</title>', 1))"

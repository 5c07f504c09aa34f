"""C4-style line-level structural cleaning (Raffel et al., JMLR 2020,
"Exploring the Limits of Transfer Learning" §2.2 — the C4 heuristics,
with the boilerplate-line additions popularized by RefinedWeb /
Penedo et al. 2023), made relational.

The classic web-corpus cleaning pass works INSIDE each document: split
the page into lines, keep only lines that look like prose (terminal
punctuation, a minimum word count, no "enable javascript" chrome),
then drop whole pages that are too short after cleaning or contain
tell-tale junk ("lorem ipsum" placeholder text, curly braces from
leaked code).  Every published English web corpus (C4, CCNet-filtered
CommonCrawl, RefinedWeb, Dolma) runs a variant of this stage before
any dedup or model-based scoring.

Scale shape: the whole pass is per-row higher-order array expressions
(split → filter → array_join) — narrow, no shuffle, no UDF, fully
inside whole-stage codegen.  At 100 TB it fuses into the scan
projection; cost is O(total bytes), embarrassingly parallel, and
composes with the downstream corpus pipeline without adding a stage
boundary.

Determinism: outputs are strings, integers and booleans only (the
clean-text fingerprint is md5, portable across engines); the DuckDB
oracle restates every rule with list_filter/list_transform
(queries/corpus.py), so the driver hash-verifies each document's
cleaned content, not just counts.

Rule set (each parameterized, defaults = the published recipe):

- line kept iff: ends in a terminal punctuation mark ('.', '!', '?',
  '"'); has >= ``min_line_words`` words (C4 uses 3); does not contain
  a boilerplate marker ("javascript", "cookie policy", "terms of
  use" — case-insensitive).
- page kept iff: >= ``min_kept_lines`` surviving lines (C4 drops
  pages with < 5 sentences); no "lorem ipsum"; no '{'.

Reference parity note: the reference ETL (Porter.php) has no text
curation surface — this is part of the mandated LLM-data-pipeline
extension layer (SURVEY.md §2 EXT).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TERMINAL_PUNCT = (".", "!", "?", '"')
LINE_BOILERPLATE = ("javascript", "cookie policy", "terms of use")
PAGE_BOILERPLATE = ("lorem ipsum", "{")
MIN_LINE_WORDS = 3
MIN_KEPT_LINES = 5


def line_keep_expr(
    line: Column,
    min_line_words: int = MIN_LINE_WORDS,
    terminal: tuple[str, ...] = TERMINAL_PUNCT,
    boilerplate: tuple[str, ...] = LINE_BOILERPLATE,
) -> Column:
    """C4 line rule as one boolean expression over a line string."""
    trimmed = F.trim(line)
    keep = F.substring(trimmed, -1, 1).isin(*terminal)
    keep = keep & (F.size(F.split(trimmed, " ")) >= min_line_words)
    low = F.lower(trimmed)
    for marker in boilerplate:
        keep = keep & ~low.contains(marker)
    return keep


def word_blocklist_expr(
    text: Column, words: tuple[str, ...]
) -> Column:
    """C4 §2.2's "bad words" page rule, WORD-BOUNDARY exact: True when
    no entry of the blocklist occurs in the lowercased page.  Substring
    matching over-blocks ("class" contains "ass"), so single-token
    entries are matched token-for-token — the page tokenized on
    non-alphanumeric runs, one ``arrays_overlap`` against a
    broadcast-literal set, still a narrow codegen expression.  The
    published recipe's LDNOOBW list also has MULTI-WORD entries
    ("make me come"); token-for-token can never match those, so any
    entry containing a non-alphanumeric char becomes a word-boundary
    phrase regexp (its alphanumeric runs joined by ``[^a-z0-9]+``,
    anchored to non-word chars or string edges) — one ``rlike`` per
    phrase entry, and phrase lists are short."""
    import re as _re

    low = F.lower(text)
    singles = [w.lower() for w in words if _re.fullmatch(r"[a-z0-9]+", w.lower())]
    phrases = [w.lower() for w in words if not _re.fullmatch(r"[a-z0-9]+", w.lower())]
    ok = F.lit(True)
    if singles:
        toks = F.split(low, "[^a-z0-9]+")
        ok = ok & ~F.arrays_overlap(
            toks, F.array(*[F.lit(w) for w in singles])
        )
    for p in phrases:
        runs = [r for r in _re.split(r"[^a-z0-9]+", p) if r]
        if not runs:
            continue
        pat = (
            "(^|[^a-z0-9])"
            + "[^a-z0-9]+".join(_re.escape(r) for r in runs)
            + "([^a-z0-9]|$)"
        )
        ok = ok & ~low.rlike(pat)
    return ok


def _page_exprs(
    text_col: str,
    min_line_words: int,
    min_kept_lines: int,
    terminal: tuple[str, ...],
    line_boilerplate: tuple[str, ...],
    page_boilerplate: tuple[str, ...],
    word_blocklist: tuple[str, ...] = (),
) -> tuple[Column, Column, Column]:
    """(all lines, kept lines, page_kept) over ``text_col``."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines,
        lambda l: line_keep_expr(l, min_line_words, terminal, line_boilerplate),
    )
    low_page = F.lower(F.col(text_col))
    page_ok = F.size(kept) >= min_kept_lines
    for marker in page_boilerplate:
        page_ok = page_ok & ~low_page.contains(marker)
    if word_blocklist:
        page_ok = page_ok & word_blocklist_expr(F.col(text_col), word_blocklist)
    return lines, kept, page_ok


def c4_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = MIN_LINE_WORDS,
    min_kept_lines: int = MIN_KEPT_LINES,
    terminal: tuple[str, ...] = TERMINAL_PUNCT,
    line_boilerplate: tuple[str, ...] = LINE_BOILERPLATE,
    page_boilerplate: tuple[str, ...] = PAGE_BOILERPLATE,
    word_blocklist: tuple[str, ...] = (),
) -> DataFrame:
    """Apply the C4 line + page rules to every document.

    Returns one row per INPUT document (kept or not, so the caller can
    audit what was dropped): (id, clean_text, n_lines, n_lines_kept,
    page_kept).  ``clean_text`` is the kept lines re-joined with
    newlines (empty string when nothing survives); ``page_kept`` folds
    the minimum-surviving-lines rule and the page-level junk markers.

    One narrow projection — no shuffle, no UDF.
    """
    lines, kept, page_ok = _page_exprs(
        text_col, min_line_words, min_kept_lines, terminal,
        line_boilerplate, page_boilerplate, word_blocklist,
    )
    return df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_lines_kept"),
        page_ok.alias("page_kept"),
    )


def c4_keep(
    df: DataFrame,
    text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """Filtering form: only surviving pages, ``text_col`` replaced in
    place by the cleaned text, all other columns carried through — the
    shape the corpus builder composes with.  Still one projection +
    one filter (no join: the rules are recomputed inline, which
    Catalyst CSEs into a single pass)."""
    _, kept, page_ok = _page_exprs(
        text_col,
        kwargs.get("min_line_words", MIN_LINE_WORDS),
        kwargs.get("min_kept_lines", MIN_KEPT_LINES),
        kwargs.get("terminal", TERMINAL_PUNCT),
        kwargs.get("line_boilerplate", LINE_BOILERPLATE),
        kwargs.get("page_boilerplate", PAGE_BOILERPLATE),
        kwargs.get("word_blocklist", ()),
    )
    return df.filter(page_ok).withColumn(text_col, F.array_join(kept, "\n"))

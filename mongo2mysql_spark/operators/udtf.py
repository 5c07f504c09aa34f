"""Python UDTF surface — table-function extensibility (SURVEY.md §2
'UDF / UDAF / UDTF surface'; absent in the reference, which has no
plugin seam at all — its extension point is editing the hard-coded
kludge block Porter.php:303-316).

The engine's own operators stay JVM-side (narrow column expressions,
``operators/chunking`` is the scale path for chunk explosion) — a UDTF
is the *user* extensibility seam: logic that genuinely needs Python and
a one-row-to-many-rows shape plugs in as a lateral table function
without touching engine code.  Spark 4 UDTFs are Arrow-batched
(``useArrow=True``): rows move in columnar batches, not pickled one at
a time, and the planner places the expansion after pushed filters.

``split_sentences`` is the worked example: document text → one row per
sentence with index and character offsets (the row shape a chunk/align
/cite pipeline wants).  Deterministic pure function of its input —
safe under task retries and speculative execution.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

# Sentence boundary: run of terminators, then whitespace (or end).  A
# compiled module-level regex — workers import this module once per
# interpreter, not per row.
_BOUNDARY = re.compile(r"[.!?]+(?:\s+|$)")


def split_sentences_py(text: str | None) -> list[tuple[int, str, int, int]]:
    """Pure-Python reference: ``(sent_idx, sentence, start_pos,
    end_pos)`` per sentence; offsets are [start, end) into the original
    string, terminator included, surrounding whitespace excluded."""
    if not text:
        return []
    out: list[tuple[int, str, int, int]] = []
    start = 0
    idx = 0
    for m in _BOUNDARY.finditer(text):
        end = m.start() + len(m.group().rstrip())
        sent = text[start:end].strip()
        if sent:
            lead = len(text[start:end]) - len(text[start:end].lstrip())
            out.append((idx, sent, start + lead, end))
            idx += 1
        start = m.end()
    tail = text[start:].strip()
    if tail:
        lead = len(text[start:]) - len(text[start:].lstrip())
        out.append((idx, tail, start + lead, len(text.rstrip())))
    return out


@udtf(returnType="sent_idx int, sentence string, start_pos int, end_pos int",
      useArrow=True)
class SplitSentences:
    """Lateral table function over a text column:

    >>> spark.udtf.register("split_sentences", SplitSentences)
    >>> spark.sql("SELECT d.doc_id, s.* FROM documents d, "
    ...           "LATERAL split_sentences(d.text) s")
    """

    def eval(self, text: str | None):  # noqa: D102 - UDTF contract
        yield from split_sentences_py(text)


def register_udtfs(spark) -> None:
    """Install the engine's table functions into a session."""
    spark.udtf.register("split_sentences", SplitSentences)

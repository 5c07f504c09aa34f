"""Bloom-filter join pruning — the runtime semi-join filter (Bloom
1970; the "runtime filter" of modern engines, incl. Spark's own
`spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`): build a
bit-array summary of the BUILD side's join keys, test every PROBE row
against it BEFORE the shuffle/join, and let only possible matches
through.  No false negatives ever (the join result is unchanged —
the property the driver gate hashes); false positives only cost a
wasted probe row.

Why it matters at 100 TB: a selective dimension predicate ("customers
in segment X") reaches the fact scan as a few KB of bits, so the fact
table is pruned to ~match-rate before the join shuffle — the
difference between shuffling 100 TB and shuffling the matching
percent.  Spark's built-in runtime filter makes the same move
planner-internally; this operator makes it explicit, deterministic,
and cross-engine verifiable.

Engine discipline: positions come from k salted md5 hashes
(``md5('bj<i>|' || key)`` first 12 hex chars mod m·62), words are
62-bit BIGINTs folded with ``bit_or`` — every bit identical in
DuckDB, so the filter CONTENTS hash, the pass/reject counts hash,
and the filtered-join aggregate hashes against the UNFILTERED
restatement (no-false-negative proof).

Scale shape: the build is one map-side-combined aggregate to
``m_words`` rows; the probe is a pure column expression over a
driver-collected literal array (the broadcast-variable shape —
nothing joins, nothing shuffles before the filter applies).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 62  # stay clear of BIGINT sign on both engines


def _hash_pos(key: Column, i: int, m_bits: int) -> Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"bj{i}|"), key.cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        % m_bits
    )


def _sql_hash_pos(key_sql: str, i: int, m_bits: int) -> str:
    return (
        f"(CAST('0x' || substr(md5('bj{i}|' ||"
        f" CAST({key_sql} AS VARCHAR)), 1, 12) AS BIGINT) % {m_bits})"
    )


def bloom_build(
    df: DataFrame, key_col: str, m_words: int, k: int
) -> DataFrame:
    """The filter contents: (word, bits) over the build side's keys —
    one map-side-combined aggregate, <= m_words rows.  Absent words
    are all-zero (the probe treats them as rejects)."""
    m_bits = m_words * WORD_BITS
    key = F.col(key_col)
    pos = F.explode(
        F.array(*[_hash_pos(key, i, m_bits) for i in range(k)])
    ).alias("pos")
    return (
        df.filter(key.isNotNull())
        .select(pos)
        .select(
            (F.col("pos") / WORD_BITS).cast("long").alias("word"),
            # shiftleft by a COLUMN bit count needs the SQL function
            # (the classic F.shiftleft signature takes a literal)
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("pos") % WORD_BITS).cast("int"),
            ).alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
    )


def sql_bloom_build(
    source_sql: str, key_sql: str, m_words: int, k: int,
    prefix: str = "bj",
) -> str:
    """DuckDB twin of :func:`bloom_build`; ends in
    ``<prefix>words(word, bits)``."""
    m_bits = m_words * WORD_BITS
    x = prefix
    legs = "\n      UNION ALL ".join(
        f"SELECT {_sql_hash_pos(key_sql, i, m_bits)} AS pos"
        f" FROM {source_sql} WHERE {key_sql} IS NOT NULL"
        for i in range(k)
    )
    return f"""{x}pos AS (
      {legs}),
    {x}words AS (
      SELECT pos // {WORD_BITS} AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % {WORD_BITS} AS INTEGER))
               AS bits
      FROM {x}pos GROUP BY 1)"""


def bloom_might_contain(
    key: Column, words: list[int], k: int
) -> Column:
    """The probe predicate: TRUE iff every one of the key's k bits is
    set in ``words`` (the driver-collected filter, zero-filled to
    m_words entries — the broadcast-variable shape: a pure column
    expression, no join)."""
    m_words = len(words)
    m_bits = m_words * WORD_BITS
    arr = F.array(*[F.lit(int(w)) for w in words])
    cond = F.lit(True)
    for i in range(k):
        pos = _hash_pos(key, i, m_bits)
        word_val = F.element_at(arr, (pos / WORD_BITS).cast("int") + 1)
        bit = (pos % WORD_BITS).cast("int")
        cond = cond & (
            F.call_function("shiftright", word_val, bit)
            .bitwiseAND(F.lit(1)) == 1
        )
    return cond


def bloom_words_array(bloom_df: DataFrame, m_words: int) -> list[int]:
    """Collect the (word, bits) frame into the zero-filled literal
    array :func:`bloom_might_contain` consumes — <= m_words rows, the
    bounded-collect discipline (like the UniMax D-row collect)."""
    words = [0] * m_words
    for r in bloom_df.collect():
        words[int(r["word"])] = int(r["bits"])
    return words


def sql_bloom_filter(
    source_sql: str, key_sql: str, m_words: int, k: int,
    prefix: str = "bj",
) -> str:
    """DuckDB twin of the probe: rows of ``source_sql`` whose key
    passes the filter in ``<prefix>words`` — k word lookups as inner
    joins (an absent word means bits = 0, i.e. reject, which the
    inner join encodes by dropping the row).  Ends in
    ``<prefix>pass(... source columns ...)``."""
    m_bits = m_words * WORD_BITS
    x = prefix
    pcols = ", ".join(
        f"{_sql_hash_pos(key_sql, i, m_bits)} AS p{i}" for i in range(k)
    )
    joins = "\n      ".join(
        f"JOIN {x}words w{i} ON w{i}.word = e.p{i} // {WORD_BITS}"
        for i in range(k)
    )
    conds = " AND ".join(
        f"((w{i}.bits >> CAST(e.p{i} % {WORD_BITS} AS INTEGER)) & 1) = 1"
        for i in range(k)
    )
    return f"""{x}probe AS (
      SELECT *, {pcols} FROM {source_sql}),
    {x}pass AS (
      SELECT e.* FROM {x}probe e
      {joins}
      WHERE {conds})"""

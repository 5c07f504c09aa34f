"""Local replica of the driver's DuckDB-oracle comparison.

The driver compares each ``queries()`` entry against its
``oracle_sql()`` at sf0.01: row count + schema + order-insensitive
value hash.  This module replays that check locally (default sf0.001
for speed) so mismatches are caught before the round gate.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def spark_result(df):
    cols = list(df.columns)
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duck_result(con, sql: str):
    cur = con.sql(sql)
    cols = list(cur.columns)
    rows = cur.fetchall()
    return cols, rows


def compare(spark_df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    scols, srows = spark_result(spark_df)
    dcols, drows = duck_result(con, sql)
    problems: list[str] = []
    if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
        problems.append(f"column mismatch: spark={sorted(scols)} duck={sorted(dcols)}")
        return problems
    if len(srows) != len(drows):
        problems.append(f"row count mismatch: spark={len(srows)} duck={len(drows)}")
    s = canon_rows([c.lower() for c in scols], srows)
    d = canon_rows([c.lower() for c in dcols], drows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b]
        problems.append(
            f"value mismatch: {len(diffs)} differing rows of {len(s)}; "
            f"first few: {diffs[:3]}"
        )
        only_s = [r for r in s if r not in set(d)][:3]
        only_d = [r for r in d if r not in set(s)][:3]
        problems.append(f"spark-only sample: {only_s}; duck-only sample: {only_d}")
    return problems

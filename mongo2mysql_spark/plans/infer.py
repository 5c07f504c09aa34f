"""Distributed schema inference (SURVEY.md §2 A12/A14, set-oriented).

The reference guesses a type per value and widens per row
(ensureRowStructure, Porter.php:86-123) — a per-row DDL round-trip its
own README calls the bottleneck (README.md:63-64).  The Spark rebuild
separates the schema pass from the data pass (SURVEY §3): ONE
aggregation over the DataFrame computes, for every string column, the
max length / all-ISO / all-null statistics, and the driver maps those
to reference type strings via the lattice.  Cost at 100 TB: a single
scan with partial aggregation (max/min combine map-side), no shuffle
wider than one row per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo2mysql_spark.plans.lattice import db_type_for_spark

# Spark-side mirror of lattice.ISO_DATETIME_RE (Java regex, Porter.php:372).
ISO_RE_SQL = r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d{1,4})?.*"


def _schema_stat_aggs(fields) -> list:
    aggs = []
    for field in fields:
        name = field.name
        aggs.append(F.count(F.col(name)).alias(f"__cnt__{name}"))
        if field.dataType.typeName() == "string":
            aggs.append(F.max(F.length(name)).alias(f"__len__{name}"))
            aggs.append(
                F.min(F.col(name).rlike(ISO_RE_SQL).cast("int")).alias(f"__iso__{name}")
            )
    return aggs


def _stats_to_schema(fields, stats: dict, strict: bool) -> dict[str, str]:
    out: dict[str, str] = {}
    for field in fields:
        name = field.name
        type_name = field.dataType.typeName()
        all_null = (stats.get(f"__cnt__{name}") or 0) == 0
        max_len = stats.get(f"__len__{name}")
        all_iso = stats.get(f"__iso__{name}") == 1
        try:
            out[name] = db_type_for_spark(
                type_name, max_strlen=max_len, all_iso=all_iso, all_null=all_null
            )
        except Exception:
            if strict:
                raise
            out[name] = "text"
    return out


def infer_table_schema(df: DataFrame, strict: bool = True) -> dict[str, str]:
    """Return {column → reference db type} for a flat DataFrame.

    One aggregation job; string statistics and null counts for all
    columns are computed in the same pass.
    """
    aggs = _schema_stat_aggs(df.schema.fields)
    stats = df.agg(*aggs).collect()[0].asDict() if aggs else {}
    return _stats_to_schema(df.schema.fields, stats, strict)


def infer_table_schemas_grouped(
    df: DataFrame, table_col: str = "_table", strict: bool = False
) -> dict[str, dict[str, str]]:
    """Per-routed-table schema inference in ONE grouped aggregation.

    The porter's routing split fans one collection into N destination
    tables; inferring each filtered branch separately costs N scans of
    the source.  This computes every table's column statistics in a
    single ``groupBy(table_col)`` pass (partial aggregation map-side —
    one shuffle of N×columns stat rows, regardless of input size).
    Returns {table → {column → reference db type}}.
    """
    fields = [f for f in df.schema.fields if f.name != table_col]
    aggs = _schema_stat_aggs(fields)
    if not aggs:
        return {}
    rows = df.groupBy(table_col).agg(*aggs).collect()
    return {
        r[table_col]: _stats_to_schema(fields, r.asDict(), strict) for r in rows
    }

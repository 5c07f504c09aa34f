"""Referential-integrity validation (extension layer — the
constraint-checking pass of ETL/data-quality frameworks; the reference
TRUSTS its own `_parentid` links, Porter.php:254-257, and never
verifies them, so a validator is the natural companion to the porter's
parent↔child output).

For a declared FK (child.fk → parent.pk), report per child table:
rows with a non-null FK, how many resolve against the parent, and the
orphan count/fraction.  ONE aggregation per relation: the child is
left-joined to the DISTINCT parent-key projection (a broadcast-sized
dimension at TPC-H shapes; at 100 TB a shuffle join on the key — no
row explosion because the key side is distinct), then a single
count(*)/count(pk) pass — no anti-join second scan, no driver-side
counting.  All outputs are integer counts + one ROUND(int/int, 6)
fraction, so the driver hashes them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_orphan_stats(
    child: DataFrame, fk_col: str, parent: DataFrame, pk_col: str, name: str
) -> DataFrame:
    """1-row (relation, n_rows, matched, n_orphans, orphan_frac)."""
    keys = parent.select(F.col(pk_col).alias("__pk")).distinct()
    joined = child.filter(F.col(fk_col).isNotNull()).join(
        keys, F.col(fk_col) == F.col("__pk"), "left"
    )
    agg = joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("__pk").alias("matched"),
    )
    return agg.select(
        F.lit(name).alias("relation"),
        "n_rows",
        "matched",
        (F.col("n_rows") - F.col("matched")).alias("n_orphans"),
        F.round(
            (F.col("n_rows") - F.col("matched")).cast("double")
            / F.greatest(F.col("n_rows"), F.lit(1)).cast("double"),
            6,
        ).alias("orphan_frac"),
    )


def integrity_report(
    relations: list[tuple[DataFrame, str, DataFrame, str, str]]
) -> DataFrame:
    """Union of :func:`fk_orphan_stats` over declared relations."""
    out = None
    for child, fk, parent, pk, name in relations:
        row = fk_orphan_stats(child, fk, parent, pk, name)
        out = row if out is None else out.unionByName(row)
    return out

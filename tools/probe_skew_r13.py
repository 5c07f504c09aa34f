"""VERDICT r12 #8: probe key distributions of the two biggest remaining
hot-key-suspect shuffles — the dedup LSH banded join (band_hash) and
the hypertable covered-window expansion ((key, window-hour)) — to
decide whether §2.5 salting is warranted.

A max/median partition-load ratio under ~5x means the shuffle is NOT
skew-bound and salting would only add cost (guide §2.5).  Results go
to COVERAGE.md / OPTIMIZATION_r13.md.

Usage: SPARK_GRAFT_SF_DIR=... python tools/probe_skew_r13.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mongo2mysql_spark.session import build_session  # noqa: E402
from mongo2mysql_spark.sources.parquet import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def dist_stats(df, cols, label: str) -> None:
    """Per-key row counts -> max/median/p99 + hash-partition load at
    the session's shuffle parallelism (what a reducer actually sees)."""
    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n"))
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    per_key = counts.select(
        F.expr("max(n)").alias("max_n"),
        F.expr("percentile(n, 0.5)").alias("med_n"),
        F.expr("percentile(n, 0.99)").alias("p99_n"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("rows"),
    ).first()
    part_load = (
        counts.groupBy(F.pmod(F.hash(*cols), F.lit(n_part)).alias("p"))
        .agg(F.sum("n").alias("load"))
        .select(
            F.expr("max(load)").alias("max_load"),
            F.expr("percentile(load, 0.5)").alias("med_load"),
        )
        .first()
    )
    print(
        f"{label}: keys={per_key['n_keys']} rows={per_key['rows']} "
        f"per-key max/med/p99 = {per_key['max_n']}/{per_key['med_n']}/"
        f"{per_key['p99_n']} (ratio {per_key['max_n'] / max(per_key['med_n'], 1):.1f}x)  "
        f"partition load max/med = {part_load['max_load']}/{part_load['med_load']} "
        f"(ratio {part_load['max_load'] / max(part_load['med_load'], 1):.1f}x @ {n_part} parts)",
        flush=True,
    )


def main() -> None:
    spark = build_session(
        app_name="probe_skew_r13",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # 1. dedup banded join: minhash signatures -> (band_idx, band_hash)
    from mongo2mysql_spark.functions.text import tokens, word_shingles
    from mongo2mysql_spark.operators.dedup import _band_melt, minhash_signature

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    sig = minhash_signature(
        docs, "doc_id", word_shingles(tokens(F.col("text")), 3), k=16
    )
    melt = _band_melt(sig, "doc_id", k=16, bands=8)
    dist_stats(melt, ["__band_idx", "__band_hash"], "dedup banded join key")

    # 2. hypertable covered-window expansion: (key, __wh) after the
    # 24x explode of (event_type, user, hour) activity cells
    ev = load_table(spark, SF_DIR, "events")
    h = F.floor(F.unix_timestamp(F.col("ts")) / 3600).cast("long")
    cells = (
        ev.select(F.col("event_type").alias("key"), F.col("user_id").alias("user"), h.alias("__h"))
        .distinct()
    )
    covered = cells.select(
        "key", "user",
        F.explode(F.sequence(F.col("__h"), F.col("__h") + 23)).alias("__wh"),
    )
    dist_stats(covered, ["key", "__wh"], "hypertable covered-window key")

    spark.stop()


if __name__ == "__main__":
    main()

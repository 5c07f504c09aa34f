"""Streaming ordered-funnel tracking (``applyInPandasWithState``):
per-user conversion-stage state advanced across micro-batches —
the streaming analogue of ``operators/behavior.funnel_counts``
(extension layer — live funnel dashboards over an event stream).

State per user is three scalars: (stage reached, completion-ts µs,
completion event id).  Each micro-batch sorts its rows by (ts, id) and
scans forward, advancing the stage whenever the next needed step type
appears strictly after the current completion — the forward scan over
ascending (ts, id) picks the FIRST qualifying event per stage, which
is exactly the batch operator's lexicographic-min completion chain, so
replaying an in-order stream reproduces the batch funnel EXACTLY (the
driver hashes the streaming counts against the batch oracle).
Out-of-order arrival ACROSS batches advances against state as of
arrival — the same streaming trade-off every stateful lift here
documents (streaming/stateful.py).

Scale: state is 3 scalars per user in the state store (RocksDB on a
cluster), partitioned by user — executors shard the key space; each
batch's work is one Arrow pass over that batch's rows.  Production
deployments add ``GroupStateTimeout.EventTimeTimeout`` so dormant
users age out; the bounded harness runs without one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout


def streaming_funnel_progress(
    stream: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    id_col: str,
    steps: list[str],
) -> DataFrame:
    """Per-batch emission of each active user's funnel stage so far.

    Output: (``user_col`` BIGINT, stage INT) — one row per (user,
    batch-with-activity); stages are monotone per user, so a reader
    takes ``max(stage)`` per user.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    out_schema = f"{user_col} bigint, stage int"

    def advance(key, pdfs, state):
        import pandas as pd

        stage, t_us, t_id = state.get if state.exists else (0, -1, -1)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values([ts_col, id_col])
        for typ, ts_v, id_v in zip(
            batch[type_col], batch[ts_col], batch[id_col]
        ):
            if stage >= len(steps):
                break
            us = ts_v.value // 1000  # pandas ns -> µs (storage precision)
            if typ == steps[stage] and (us, int(id_v)) > (t_us, t_id):
                stage += 1
                t_us, t_id = us, int(id_v)
        state.update((int(stage), int(t_us), int(t_id)))
        yield pd.DataFrame({user_col: [key[0]], "stage": [stage]})

    return stream.groupBy(user_col).applyInPandasWithState(
        advance,
        out_schema,
        "stage int, t_us long, t_id long",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def funnel_counts_from_progress(
    progress: DataFrame, user_col: str, steps: list[str]
) -> DataFrame:
    """Collapse the per-batch progress emissions into the batch
    operator's output shape: (step, event_type, users, denom, rate).
    Steps nobody reached still get a 0-count row (as the batch form
    does); the conversion join runs on the bounded step-list frame."""
    spark = progress.sparkSession
    reached = progress.groupBy(user_col).agg(F.max("stage").alias("stage"))
    per_step = (
        reached.filter(F.col("stage") >= 1)
        .select(F.explode(F.sequence(F.lit(1), F.col("stage"))).alias("step"))
        .groupBy("step")
        .agg(F.count(F.lit(1)).alias("users"))
    )
    ladder = spark.createDataFrame(
        [(i, s) for i, s in enumerate(steps, start=1)], "step int, event_type string"
    )
    counts = ladder.join(per_step, "step", "left").select(
        "step", "event_type", F.coalesce("users", F.lit(0)).alias("users")
    )
    prev = counts.select(
        (F.col("step") + 1).alias("step"), F.col("users").alias("denom")
    )
    return counts.join(prev, "step", "left").select(
        "step",
        "event_type",
        "users",
        "denom",
        F.when(
            F.col("denom") > 0,
            F.col("users").cast("double") / F.col("denom").cast("double"),
        ).alias("rate"),
    )

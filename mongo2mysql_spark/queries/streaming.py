"""Streaming queries: bounded streams driven to completion against the
parquet fixtures, oracle-checked against batch SQL (a windowed agg of a
bounded stream must equal the batch windowed agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mongo2mysql_spark.queries import register
from mongo2mysql_spark.streaming.pipeline import (
    run_to_memory,
    session_windows,
    sliding_counts,
    stream_events,
    tumbling_counts,
)


@register(
    "streaming_tumbling_window",
    """
    SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(30,10))), 4) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="tumbling 1h windowed counts over a stream (watermarked), == batch agg.",
)
def streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_memory(tumbling_counts(stream_events(spark, sf_dir)))


@register(
    "streaming_sliding_window",
    """
    SELECT CAST(ws AS TIMESTAMP) AS window_start, COUNT(*) AS n
    FROM (
      SELECT time_bucket(INTERVAL '30 minutes', ts) - o * INTERVAL '30 minutes' AS ws
      FROM events, unnest([0, 1]) AS t(o))
    GROUP BY 1
    """,
    doc="sliding 1h/30min windows: each event lands in exactly 2 windows.",
)
def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_memory(sliding_counts(stream_events(spark, sf_dir)))


@register(
    "streaming_session_window",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged)
    SELECT CAST(MIN(ts) AS TIMESTAMP) AS session_start, user_id, COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, sid
    """,
    doc=(
        "gap-based session windows (session_window, 30 min) — oracle is the "
        "batch lag+cumsum sessionization; starts and counts must agree."
    ),
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_memory(session_windows(stream_events(spark, sf_dir)))

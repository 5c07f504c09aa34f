"""Trace which component builders launch eager driver jobs during slot
construction (r12 probe).  Brackets each build step in a job group and
reports per-step wall + job count, warm (second call) only."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mongo2mysql_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = build_session(
        app_name="probe_components",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    def step(name, thunk):
        spark.sparkContext.setJobGroup(name, name)
        t0 = time.time()
        out = thunk()
        dt = time.time() - t0
        spark.sparkContext.setJobGroup(None, None)
        jobs = len(tracker.getJobIdsForGroup(name))
        print(f"  {name:40s} {dt:7.2f}s  {jobs:3d} jobs", flush=True)
        return out

    which = sys.argv[1] if len(sys.argv) > 1 else "both"

    if which in ("both", "sessionize"):
        from mongo2mysql_spark.sources import load_table as T
        from mongo2mysql_spark.queries.behavior import (
            FUNNEL_STEPS,
            FUNNEL_WINDOW_MS,
            PATH_DEPTH,
            PATH_K,
            _funnelstate_counts,
        )
        from mongo2mysql_spark.operators.behavior import (
            attribution_credit,
            conversion_latency,
            event_transitions,
            funnel_counts,
            funnel_max_level,
            retention_cohorts,
            session_paths,
        )
        from mongo2mysql_spark.operators.selection import exact_quantiles

        e = T(spark, SF_DIR, "events")
        for rnd in ("cold", "warm"):
            print(f"events_sessionize components [{rnd}]:")
            step("funnel", lambda: funnel_counts(
                e, "user_id", "event_type", "ts", "event_id", FUNNEL_STEPS))
            step("funnelwin", lambda: funnel_counts(
                e, "user_id", "event_type", "ts", "event_id", FUNNEL_STEPS,
                within_ms=FUNNEL_WINDOW_MS))
            step("retention", lambda: retention_cohorts(e, "user_id", "ts"))
            step("transitions", lambda: event_transitions(
                e, "user_id", "event_type", "ts", "event_id"))
            step("paths", lambda: session_paths(
                e, "user_id", "event_type", "ts", "event_id",
                depth=PATH_DEPTH, k=PATH_K))
            lat = step("conversion_latency", lambda: conversion_latency(
                e, "user_id", "event_type", "ts", "event_id", "view",
                "purchase"))
            step("exact_quantiles(lat)", lambda: exact_quantiles(
                lat.select(F.col("latency_ms").cast("double").alias("__lm")),
                "__lm", {"lat_p50": 0.5, "lat_p90": 0.9}))
            step("attribution", lambda: attribution_credit(
                e, "user_id", "event_type", "ts", "event_id", "view",
                "purchase", within_ms=FUNNEL_WINDOW_MS))
            step("funnelstate_memo", lambda: _funnelstate_counts(
                spark, SF_DIR, e))
            step("funnelmax", lambda: funnel_max_level(
                e, "user_id", "event_type", "ts", "event_id", FUNNEL_STEPS,
                within_ms=FUNNEL_WINDOW_MS))

    if which in ("both", "gapfill"):
        from mongo2mysql_spark.sources import load_table as T
        from mongo2mysql_spark.queries.ext import (
            _FC_SPLIT_DEN,
            _FC_SPLIT_NUM,
            _MAD_K,
            _RESAMPLE_INTERVAL,
            _Z_MIN_POINTS,
            _Z_THRESHOLD,
            _Z_WINDOW,
        )
        from mongo2mysql_spark.operators.anomaly import (
            mad_outliers,
            rolling_frame_stats,
        )
        from mongo2mysql_spark.operators.bars import ohlc_bars, twap_bars
        from mongo2mysql_spark.operators.forecast import seasonal_backtest
        from mongo2mysql_spark.operators.resample import resample_interpolate
        from mongo2mysql_spark.operators.trend import hourly_trend

        ev = T(spark, SF_DIR, "events", fanout=True)
        for rnd in ("cold", "warm"):
            print(f"resample_gapfill components [{rnd}]:")
            step("resample_interpolate", lambda: resample_interpolate(
                ev, "event_type", "ts", "value",
                interval_seconds=_RESAMPLE_INTERVAL, method="interpolate"))
            step("rolling_frame_stats", lambda: rolling_frame_stats(
                ev.select("event_type", "event_id", "ts", "value"),
                ["event_type"], "ts", "value", window=_Z_WINDOW,
                min_points=_Z_MIN_POINTS, threshold=_Z_THRESHOLD,
                tiebreak_cols=["event_id"]))
            step("seasonal_backtest", lambda: seasonal_backtest(
                ev, "event_type", "ts",
                split_frac_num=_FC_SPLIT_NUM, split_frac_den=_FC_SPLIT_DEN))
            step("ohlc_bars", lambda: ohlc_bars(
                ev, "event_type", "ts", "value", "event_id",
                interval_seconds=_RESAMPLE_INTERVAL))
            step("hourly_trend", lambda: hourly_trend(ev, "event_type", "ts"))
            step("twap_bars", lambda: twap_bars(
                ev, "event_type", "ts", "value", "event_id",
                interval_seconds=_RESAMPLE_INTERVAL))
            step("mad_outliers", lambda: mad_outliers(
                ev.select("event_type", "event_id", "value"),
                ["event_type"], "value", ["event_id"], k=_MAD_K))
    spark.stop()


if __name__ == "__main__":
    main()

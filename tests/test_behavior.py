"""Behavioral analytics (operators/behavior): funnel ordering
semantics, retention cohort math, transition normalization.  The
cross-engine hash is pinned by test_oracle (events_funnel_retention);
these pin the semantics on planted micro-fixtures."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from mongo2mysql_spark.operators.behavior import (
    event_transitions,
    funnel_counts,
    retention_cohorts,
)

SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, datetime(2024, 1, d, h), u, t) for i, (d, h, u, t) in enumerate(rows)],
        SCHEMA,
    )


def test_funnel_requires_strict_order(spark):
    rows = [
        # user 1: signup then view -> reaches step 2
        (1, 1, 1, "signup"),
        (1, 2, 1, "view"),
        # user 2: view BEFORE signup only -> reaches step 1, not 2
        (1, 1, 2, "view"),
        (1, 2, 2, "signup"),
        # user 3: signup only
        (2, 1, 3, "signup"),
    ]
    got = {
        r.step: r
        for r in funnel_counts(
            _ev(spark, rows), "user_id", "event_type", "ts", "event_id",
            ["signup", "view"],
        ).collect()
    }
    assert got[1].users == 3 and got[1].denom is None and got[1].rate is None
    assert got[2].users == 1 and got[2].denom == 3
    assert got[2].rate == 1.0 / 3.0


def test_funnel_tie_breaks_on_event_id(spark):
    # same timestamp: the view (higher event_id) counts as AFTER the
    # signup under (ts, id) lexicographic order
    df = spark.createDataFrame(
        [
            (10, datetime(2024, 1, 1, 1), 1, "signup"),
            (11, datetime(2024, 1, 1, 1), 1, "view"),
            # user 2 gets the view with a LOWER id at the same instant
            (21, datetime(2024, 1, 1, 1), 2, "signup"),
            (20, datetime(2024, 1, 1, 1), 2, "view"),
        ],
        SCHEMA,
    )
    got = {
        r.step: r.users
        for r in funnel_counts(
            df, "user_id", "event_type", "ts", "event_id", ["signup", "view"]
        ).collect()
    }
    assert got == {1: 2, 2: 1}


def test_funnel_multistep_chain(spark):
    rows = [
        (1, 1, 1, "signup"), (1, 2, 1, "view"), (1, 3, 1, "purchase"),
        (1, 1, 2, "signup"), (1, 2, 2, "purchase"), (1, 3, 2, "view"),
    ]
    got = {
        r.step: r.users
        for r in funnel_counts(
            _ev(spark, rows), "user_id", "event_type", "ts", "event_id",
            ["signup", "view", "purchase"],
        ).collect()
    }
    # user 2's purchase precedes their view -> drops at step 3
    assert got == {1: 2, 2: 2, 3: 1}


def test_funnel_rejects_single_step(spark):
    with pytest.raises(ValueError):
        funnel_counts(
            _ev(spark, [(1, 1, 1, "signup")]),
            "user_id", "event_type", "ts", "event_id", ["signup"],
        )


def test_retention_triangle(spark):
    # two users first seen in week of Jan 1 (Mon), one in week of Jan 8;
    # user 1 returns in week 2, user 2 does not
    rows = [
        (1, 1, 1, "view"),   # Jan 1 (Monday) -> cohort 2024-01-01
        (9, 1, 1, "view"),   # Jan 9 -> offset 1
        (2, 1, 2, "view"),   # cohort 2024-01-01
        (8, 1, 3, "view"),   # Jan 8 -> cohort 2024-01-08
    ]
    got = {
        (str(r.cohort_week), r.week_offset): (r.active, r.cohort_size, r.rate)
        for r in retention_cohorts(_ev(spark, rows), "user_id", "ts").collect()
    }
    assert got[("2024-01-01", 0)] == (2, 2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 2, 0.5)
    assert got[("2024-01-08", 0)] == (1, 1, 1.0)
    assert len(got) == 3


def test_transitions_counts_and_probs(spark):
    rows = [
        (1, 1, 1, "view"), (1, 2, 1, "click"), (1, 3, 1, "view"),
        (1, 4, 1, "click"),
        (1, 1, 2, "view"), (1, 2, 2, "purchase"),
    ]
    got = {
        (r.event_type, r.next_type): (r.n, r.total, r.prob)
        for r in event_transitions(
            _ev(spark, rows), "user_id", "event_type", "ts", "event_id"
        ).collect()
    }
    assert got[("view", "click")] == (2, 3, 2.0 / 3.0)
    assert got[("view", "purchase")] == (1, 3, 1.0 / 3.0)
    assert got[("click", "view")] == (1, 1, 1.0)
    assert len(got) == 3

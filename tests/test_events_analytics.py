"""Funnel + cohort retention operators (operators/events.py)."""

import datetime

from pure_python_geospatial_export_spark.operators.events import (
    cohort_retention,
    funnel_counts,
    funnel_stages,
)
from pure_python_geospatial_export_spark.session import local_df

BASE = datetime.datetime(2024, 3, 4)  # a Monday


def ts(days=0, minutes=0):
    return BASE + datetime.timedelta(days=days, minutes=minutes)


def _events(spark, rows):
    return local_df(spark, rows, ["user_id", "ts", "event_type"])


def test_funnel_strict_ordering(spark):
    rows = [
        # user 1: full ordered funnel
        (1, ts(minutes=0), "view"),
        (1, ts(minutes=5), "click"),
        (1, ts(minutes=9), "purchase"),
        # user 2: purchase BEFORE click -> stops at click... but a
        # second purchase after click completes it
        (2, ts(minutes=0), "view"),
        (2, ts(minutes=1), "purchase"),
        (2, ts(minutes=2), "click"),
        # user 3: click first (no view) -> reached 0
        (3, ts(minutes=0), "click"),
        (3, ts(minutes=1), "purchase"),
        # user 4: view only
        (4, ts(minutes=3), "view"),
        # user 5: simultaneous view+click (tie does not advance)
        (5, ts(minutes=0), "view"),
        (5, ts(minutes=0), "click"),
    ]
    out = {
        r["user_id"]: r
        for r in funnel_stages(
            _events(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert out[1]["reached"] == 3
    assert out[1]["t_1"] == ts(minutes=0)
    assert out[1]["t_3"] == ts(minutes=9)
    assert out[2]["reached"] == 2  # no purchase strictly after click
    assert out[2]["t_2"] == ts(minutes=2)
    assert out[3]["reached"] == 0
    assert out[3]["t_1"] is None
    assert out[4]["reached"] == 1
    assert out[5]["reached"] == 1  # tie: click not strictly after view

    counts = {
        r["stage"]: r["n_users"]
        for r in funnel_counts(
            funnel_stages(
                _events(spark, rows), ["view", "click", "purchase"]
            )
        ).collect()
    }
    assert counts == {1: 4, 2: 2, 3: 1}


def test_funnel_within_horizon(spark):
    rows = [
        (1, ts(minutes=0), "view"),
        (1, ts(minutes=30), "click"),     # within 1h of t_1
        (1, ts(days=2), "purchase"),      # outside 1h of t_1
        (2, ts(minutes=0), "view"),
        (2, ts(minutes=10), "click"),
        (2, ts(minutes=50), "purchase"),  # all inside
    ]
    out = {
        r["user_id"]: r["reached"]
        for r in funnel_stages(
            _events(spark, rows), ["view", "click", "purchase"],
            within_seconds=3600,
        ).collect()
    }
    assert out == {1: 2, 2: 3}


def test_cohort_retention_known_matrix(spark):
    rows = [
        # users 1,2 first active week 0; user 1 returns week 2
        (1, ts(days=0), "view"),
        (1, ts(days=14), "view"),
        (2, ts(days=3, minutes=5), "click"),
        # user 3 first active week 1, returns weeks 2 and 3
        (3, ts(days=8), "view"),
        (3, ts(days=16), "view"),
        (3, ts(days=22), "view"),
        # a second event in the same week must not double-count
        (2, ts(days=3, minutes=50), "view"),
    ]
    got = {
        (r["cohort"], r["offset"]): r["n_users"]
        for r in cohort_retention(_events(spark, rows)).collect()
    }
    w0 = BASE.date()
    w1 = (BASE + datetime.timedelta(days=7)).date()
    assert got == {
        (w0, 0): 2,
        (w0, 2): 1,
        (w1, 0): 1,
        (w1, 1): 1,
        (w1, 2): 1,
    }


def test_funnel_rejects_empty_stages(spark):
    import pytest

    with pytest.raises(ValueError):
        funnel_stages(_events(spark, []), [])

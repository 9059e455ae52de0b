"""funnel_steps / cohort_retention semantics (operators/funnel.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark_skyline_spark.operators.funnel import cohort_retention, funnel_steps


def _ts(day: int, hour: int = 0, minute: int = 0):
    return dt.datetime(2024, 1, day, hour, minute)


@pytest.fixture()
def events(spark):
    rows = [
        # user 1: full ordered funnel
        (1, _ts(1), "view"),
        (1, _ts(2), "click"),
        (1, _ts(3), "purchase"),
        # user 2: clicked BEFORE viewing -> funnel stops at step 1
        (2, _ts(1), "click"),
        (2, _ts(2), "view"),
        # user 3: click at the EXACT view instant -> strict > excludes it
        (3, _ts(1, 12), "view"),
        (3, _ts(1, 12), "click"),
        # user 4: purchase without click -> reached 1
        (4, _ts(1), "view"),
        (4, _ts(2), "purchase"),
        # user 5: never viewed -> not in output at all
        (5, _ts(1), "click"),
        (5, _ts(2), "purchase"),
        # user 6: multiple candidates, min AFTER the gate wins
        (6, _ts(5), "view"),
        (6, _ts(1), "click"),  # before view: ignored
        (6, _ts(6), "click"),
        (6, _ts(7), "click"),  # later duplicate: min picks day 6
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_ordering_semantics(events):
    got = {
        r.user_id: (r.step1_ts, r.step2_ts, r.step3_ts, r.reached)
        for r in funnel_steps(
            events, "user_id", "ts", "event_type", ["view", "click", "purchase"]
        ).collect()
    }
    assert set(got) == {1, 2, 3, 4, 6}  # user 5 never viewed
    assert got[1] == (_ts(1), _ts(2), _ts(3), 3)
    assert got[2] == (_ts(2), None, None, 1)  # pre-view click doesn't count
    assert got[3][3] == 1  # same-instant click excluded by strict >
    assert got[4] == (_ts(1), None, None, 1)  # purchase can't skip click
    assert got[6][1] == _ts(6)  # earliest click AFTER the view


def test_funnel_validates_steps(events):
    with pytest.raises(ValueError, match="steps"):
        funnel_steps(events, "user_id", "ts", "event_type", [])
    with pytest.raises(ValueError, match="steps"):
        funnel_steps(events, "user_id", "ts", "event_type", ["view", "view"])


def test_cohort_retention_weekly(spark):
    # 2024-01-01 is a Monday: weeks are [1..7], [8..14], [15..21]
    rows = [
        (1, _ts(2)),   # cohort week 0
        (1, _ts(9)),   # active week 1
        (1, _ts(16)),  # active week 2
        (2, _ts(3)),   # cohort week 0, never returns
        (3, _ts(10)),  # cohort week 1
        (3, _ts(11)),  # same week — distinct-user counting, not events
        (3, _ts(20)),  # active week 2 (k=1)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort, r.period_k): r.n_users
        for r in cohort_retention(df, "user_id", "ts", period="week").collect()
    }
    w0, w1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 8)
    assert got == {
        (w0, 0): 2,  # users 1 and 2
        (w0, 1): 1,  # user 1 back in week 1
        (w0, 2): 1,  # user 1 back in week 2
        (w1, 0): 1,  # user 3's cohort
        (w1, 1): 1,  # user 3 back one week later
    }
    with pytest.raises(ValueError, match="period"):
        cohort_retention(df, "user_id", "ts", period="month")

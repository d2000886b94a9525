"""operators/analytics.py: ordered-funnel matching and cohort
retention semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.operators.analytics import (
    cohort_retention,
    funnel_counts,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )


def _t(minutes):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


def test_funnel_order_matters(spark):
    ev = _ev(
        spark,
        [
            # user 1: full ordered funnel
            (1, _t(0), 1, "view"), (1, _t(1), 2, "click"), (1, _t(2), 3, "purchase"),
            # user 2: clicked BEFORE viewing — click must not count
            (2, _t(0), 4, "click"), (2, _t(1), 5, "view"),
            # user 3: view only
            (3, _t(0), 6, "view"),
            # user 4: never viewed — nothing counts
            (4, _t(0), 7, "purchase"), (4, _t(1), 8, "click"),
        ],
    )
    got = {
        r.step: (r.step_name, r.n_users)
        for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()
    }
    assert got == {1: ("view", 3), 2: ("click", 1), 3: ("purchase", 1)}


def test_funnel_equal_timestamps_tiebreak_by_event_id(spark):
    # view and click at the SAME ts: event_id orders them, so the click
    # with the higher id still follows the view deterministically
    ev = _ev(spark, [(1, _t(0), 10, "view"), (1, _t(0), 11, "click")])
    got = {r.step: r.n_users for r in funnel_counts(ev, ["view", "click"]).collect()}
    assert got == {1: 1, 2: 1}
    # reversed ids → click sorts before view → funnel stalls at view
    ev2 = _ev(spark, [(1, _t(0), 11, "view"), (1, _t(0), 10, "click")])
    got2 = {r.step: r.n_users for r in funnel_counts(ev2, ["view", "click"]).collect()}
    assert got2 == {1: 1, 2: 0}


def test_funnel_emits_zero_rows_for_unreached_steps(spark):
    ev = _ev(spark, [(1, _t(0), 1, "view")])
    rows = funnel_counts(ev, ["view", "click", "purchase"]).collect()
    assert [(r.step, r.n_users) for r in rows] == [(1, 1), (2, 0), (3, 0)]


def test_cohort_retention_triangle(spark):
    ev = _ev(
        spark,
        [
            # cohort week of Jan 1: users 1,2; user 1 returns weeks 1 and 2
            (1, _t(0), 1, "view"),
            (1, _t(60 * 24 * 7), 2, "view"),
            (1, _t(60 * 24 * 14), 3, "view"),
            (2, _t(10), 4, "view"),
            # cohort week of Jan 8: user 3
            (3, _t(60 * 24 * 7), 5, "view"),
        ],
    )
    rows = {
        (r.cohort_week.date().isoformat(), r.week_offset): (r.n_users, r.retention)
        for r in cohort_retention(ev).collect()
    }
    assert rows[("2024-01-01", 0)] == (2, 1.0)
    assert rows[("2024-01-01", 1)] == (1, 0.5)
    assert rows[("2024-01-01", 2)] == (1, 0.5)
    assert rows[("2024-01-08", 0)] == (1, 1.0)
    assert len(rows) == 4


def test_cohort_retention_multiple_events_one_week_count_once(spark):
    ev = _ev(spark, [(1, _t(0), 1, "view"), (1, _t(5), 2, "click")])
    rows = cohort_retention(ev).collect()
    assert len(rows) == 1 and rows[0].n_users == 1


# ---------------------------------------------------------------------------
# property-based differential test: the distributed fold must agree with
# a trivially-correct per-user Python reference on random event sets
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

STEPS = ["view", "click", "purchase"]


@st.composite
def _event_sets(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    return [
        (
            draw(st.integers(min_value=1, max_value=4)),  # user
            draw(st.integers(min_value=0, max_value=40)),  # minute
            eid,
            draw(st.sampled_from(["view", "click", "purchase", "other"])),
        )
        for eid in range(n)
    ]


def _ref_funnel(events, steps):
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, t, e, ty in events:
        by_user[u].append((t, e, ty))
    counts = [0] * len(steps)
    for evs in by_user.values():
        evs.sort()  # (minute, event_id) — same order the operator uses
        reached = 0
        for _t, _e, ty in evs:
            if reached < len(steps) and ty == steps[reached]:
                reached += 1
        for k in range(reached):
            counts[k] += 1
    return {i + 1: c for i, c in enumerate(counts)}


@given(_event_sets())
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_funnel_matches_python_reference(spark, events):
    df = _ev(
        spark,
        [(u, _t(t), e, ty) for u, t, e, ty in events],
    )
    got = {
        r.step: r.n_users for r in funnel_counts(df, STEPS).collect()
    }
    assert got == _ref_funnel(events, STEPS)


def test_gap_fill_hourly_locf(spark):
    import datetime as dt

    from stac_fastapi_duckdb_spark.operators.analytics import gap_fill_hourly

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: events at hours 0, 3 → gaps at 1, 2 carry hour-0 value
        (1, base, 10.0),
        (1, base + dt.timedelta(hours=3), 7.0),
        # two events same hour aggregate before filling
        (1, base + dt.timedelta(hours=3, minutes=30), 1.0),
        # user 2: single hour → spine of one, no gaps
        (2, base + dt.timedelta(hours=5), 2.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {
        (r.user_id, r.bucket.hour): (r.is_gap, r.v_filled)
        for r in gap_fill_hourly(df).collect()
    }
    assert out[(1, 0)] == (False, 10.0)
    assert out[(1, 1)] == (True, 10.0)   # carried forward
    assert out[(1, 2)] == (True, 10.0)
    assert out[(1, 3)] == (False, 8.0)   # 7 + 1 aggregated
    assert out[(2, 5)] == (False, 2.0)
    assert len(out) == 5  # spine never extends beyond each key's range

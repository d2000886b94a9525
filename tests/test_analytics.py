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


# ---------------------------------------------------------------------------
# path analysis + pair co-occurrence
# ---------------------------------------------------------------------------


def _path_events(spark, rows):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_top_paths_counts_sliding_trigrams(spark):
    from stac_fastapi_duckdb_spark.operators.analytics import top_paths

    rows = [
        # user 1: a b c d  → paths a>b>c, b>c>d
        (1, "2024-01-01 00:00:01", 1, "a"),
        (2, "2024-01-01 00:00:02", 1, "b"),
        (3, "2024-01-01 00:00:03", 1, "c"),
        (4, "2024-01-01 00:00:04", 1, "d"),
        # user 2: a b c     → a>b>c  (a>b>c total = 2)
        (5, "2024-01-01 00:00:01", 2, "a"),
        (6, "2024-01-01 00:00:02", 2, "b"),
        (7, "2024-01-01 00:00:03", 2, "c"),
        # user 3: too short for n=3
        (8, "2024-01-01 00:00:01", 3, "a"),
        (9, "2024-01-01 00:00:02", 3, "b"),
    ]
    got = [
        (r.path, r.n)
        for r in top_paths(_path_events(spark, rows), n=3, k=10).collect()
    ]
    assert got == [("a>b>c", 2), ("b>c>d", 1)]


def test_top_paths_orders_by_ts_then_id_and_breaks_count_ties(spark):
    from stac_fastapi_duckdb_spark.operators.analytics import top_paths

    rows = [
        (2, "2024-01-01 00:00:01", 1, "y"),  # ts tie with id 1 → id order
        (1, "2024-01-01 00:00:01", 1, "x"),
        (3, "2024-01-01 00:00:02", 1, "z"),
    ]
    got = [(r.path, r.n) for r in top_paths(_path_events(spark, rows), n=2).collect()]
    assert got == [("x>y", 1), ("y>z", 1)]  # count tie → path asc


def test_cooccurring_pairs_counts_users_not_events(spark):
    from stac_fastapi_duckdb_spark.operators.analytics import (
        cooccurring_pairs,
    )

    rows = [
        # user 1 sees a twice + b: pair (a,b) counted ONCE for the user
        (1, "2024-01-01 00:00:01", 1, "a"),
        (2, "2024-01-01 00:00:02", 1, "a"),
        (3, "2024-01-01 00:00:03", 1, "b"),
        # user 2: a, b, c
        (4, "2024-01-01 00:00:01", 2, "a"),
        (5, "2024-01-01 00:00:02", 2, "b"),
        (6, "2024-01-01 00:00:03", 2, "c"),
        # user 3: only c
        (7, "2024-01-01 00:00:01", 3, "c"),
    ]
    got = {
        (r.item_a, r.item_b): r.n_users
        for r in cooccurring_pairs(
            _path_events(spark, rows), min_support=1
        ).collect()
    }
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}
    sup2 = {
        (r.item_a, r.item_b): r.n_users
        for r in cooccurring_pairs(
            _path_events(spark, rows), min_support=2
        ).collect()
    }
    assert sup2 == {("a", "b"): 2}


def test_top_paths_empty_and_pair_plan_shape(spark):
    from stac_fastapi_duckdb_spark.operators.analytics import (
        cooccurring_pairs,
        top_paths,
    )

    empty = _path_events(spark, [])
    assert top_paths(empty).count() == 0
    assert cooccurring_pairs(empty).count() == 0
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = (
        top_paths(ev)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan and plan.count("Window") == 1
    for bad in ("CartesianProduct", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan


# ------------------------------------------------- seasonal decomposition


def test_seasonal_decompose_recovers_planted_period(spark):
    from stac_fastapi_duckdb_spark.operators.analytics import (
        seasonal_decompose_hourly,
    )

    # 8 days of hourly events for one type: base 5/hour + 10 extra at
    # hour 12 — a pure period-24 signal with zero trend slope
    rows = []
    base = dt.datetime(2024, 1, 1)
    eid = 0
    for h in range(24 * 8):
        t = base + dt.timedelta(hours=h)
        n = 5 + (10 if t.hour == 12 else 0)
        for _ in range(n):
            rows.append((eid, "click", t))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp"
    )
    out = seasonal_decompose_hourly(ev).collect()
    # interior rows only: 192 hours - 2*12 edge rows
    assert len(out) == 24 * 8 - 24
    by_hod = {}
    for r in out:
        by_hod.setdefault(r.bucket.hour, []).append(r)
    # the hour-12 spike lands in the seasonal component…
    s12 = by_hod[12][0].seasonal
    s_other = by_hod[0][0].seasonal
    assert s12 - s_other > 8.0
    # …and the additive identity holds exactly up to rounding
    for r in out:
        assert abs(r.y - (r.trend + r.seasonal + r.residual)) < 5e-6
    # flat series → trend stays near the global mean everywhere
    for r in out:
        assert abs(r.trend - (5 + 10 / 24)) < 0.5


def test_seasonal_decompose_interior_only_and_multi_type(spark):
    from stac_fastapi_duckdb_spark.operators.analytics import (
        seasonal_decompose_hourly,
    )

    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for typ, days in (("a", 3), ("b", 2)):
        for h in range(24 * days):
            rows.append((eid, typ, base + dt.timedelta(hours=h)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp"
    )
    out = seasonal_decompose_hourly(ev).collect()
    per = {}
    for r in out:
        per.setdefault(r.event_type, 0)
        per[r.event_type] += 1
    # each type loses exactly its 24 edge hours
    assert per == {"a": 24 * 3 - 24, "b": 24 * 2 - 24}
    # constant series: seasonal and residual vanish, trend == y == 1
    for r in out:
        assert r.trend == 1.0 and r.seasonal == 0.0 and r.residual == 0.0


# ----------------------------------------------- last-touch attribution


def test_attribution_last_touch_window_and_ties(spark):
    from stac_fastapi_duckdb_spark.operators.analytics import (
        last_touch_attribution,
    )

    t0 = dt.datetime(2024, 6, 1, 10, 0, 0)
    rows = [
        # user 1: view → click → purchase: credit the click (latest)
        (1, t0, 1, "view"),
        (2, t0 + dt.timedelta(minutes=5), 1, "click"),
        (3, t0 + dt.timedelta(minutes=9), 1, "purchase"),
        # user 2: source EXACTLY at the conversion ts → >= semantics credit it
        (4, t0, 2, "view"),
        (5, t0, 2, "purchase"),
        # user 3: only source is 25h before → outside lookback, unattributed
        (6, t0 - dt.timedelta(hours=25), 3, "view"),
        (7, t0, 3, "purchase"),
        # user 4: two sources at the SAME ts → higher event_id wins
        (8, t0, 4, "view"),
        (9, t0, 4, "click"),
        (10, t0 + dt.timedelta(minutes=1), 4, "purchase"),
        # user 5: purchase before any source → unattributed
        (11, t0, 5, "purchase"),
        (12, t0 + dt.timedelta(minutes=1), 5, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r.conversion_id: r for r in last_touch_attribution(ev).collect()}
    assert out[3].source_id == 2 and out[3].source_type == "click"
    assert out[3].lag_sec == 4 * 60
    assert out[5].source_id == 4 and out[5].lag_sec == 0
    assert out[7].source_id is None and out[7].lag_sec is None
    assert out[10].source_id == 9  # same-ts tie → higher id
    assert out[11].source_id is None
    assert len(out) == 5  # one row per conversion, always


def test_linear_attribution_credit_shares_and_unattributed(spark):
    from stac_fastapi_duckdb_spark.operators.analytics import (
        linear_attribution,
    )

    t0 = dt.datetime(2024, 6, 1, 10, 0, 0)
    rows = [
        # user 1: two sources in window → 0.5 credit each
        (1, t0 - dt.timedelta(hours=2), 1, "view"),
        (2, t0 - dt.timedelta(hours=1), 1, "click"),
        (3, t0, 1, "purchase"),
        # user 2: one source outside the 24h window → unattributed
        (4, t0 - dt.timedelta(hours=30), 2, "view"),
        (5, t0, 2, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = linear_attribution(ev).collect()
    u1 = [r for r in out if r.conversion_id == 3]
    assert {r.source_id for r in u1} == {1, 2}
    assert all(r.n_sources == 2 and abs(r.credit - 0.5) < 1e-9 for r in u1)
    u2 = [r for r in out if r.conversion_id == 5]
    assert len(u2) == 1 and u2[0].source_id is None and u2[0].n_sources == 0
    # total credit per attributed conversion is exactly 1
    assert abs(sum(r.credit for r in u1) - 1.0) < 1e-9

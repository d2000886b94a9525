"""Range join: granule bucketing must equal the naive BETWEEN join."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.operators.rangejoin import point_in_interval_join


def _ts(h):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)


def test_range_join_equals_naive(spark):
    points = spark.createDataFrame(
        [(i, i % 3, _ts(i)) for i in range(50)], "pid long, k long, t timestamp"
    )
    intervals = spark.createDataFrame(
        [(j, j % 3, _ts(j * 4), _ts(j * 4 + 6)) for j in range(12)],
        "iid long, k long, s timestamp, e timestamp",
    )
    got = point_in_interval_join(
        points, intervals, "t", "s", "e", on="k", granule_seconds=3600
    )
    naive = points.join(intervals, "k").filter(
        (F.col("t") >= F.col("s")) & (F.col("t") <= F.col("e"))
    )
    assert sorted(map(tuple, got.select("pid", "iid").collect())) == sorted(
        map(tuple, naive.select("pid", "iid").collect())
    )


def test_range_join_boundaries_inclusive(spark):
    points = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(6)), (3, _ts(7))], "pid long, t timestamp"
    )
    intervals = spark.createDataFrame(
        [(10, _ts(0), _ts(6))], "iid long, s timestamp, e timestamp"
    )
    got = sorted(
        r.pid
        for r in point_in_interval_join(
            points, intervals, "t", "s", "e", granule_seconds=7200
        ).collect()
    )
    assert got == [1, 2]  # both endpoints inclusive; outside point dropped


def test_range_join_no_key_cross_interval(spark):
    # keyless variant: every point checked against every overlapping
    # granule interval only (no full cross product in the plan)
    points = spark.createDataFrame([(1, _ts(5))], "pid long, t timestamp")
    intervals = spark.createDataFrame(
        [(10, _ts(0), _ts(24)), (11, _ts(30), _ts(40))],
        "iid long, s timestamp, e timestamp",
    )
    got = point_in_interval_join(points, intervals, "t", "s", "e")
    assert [r.iid for r in got.collect()] == [10]


# ------------------------------------------------ interval overlap join


def test_interval_overlap_join_exact_and_no_duplicates(spark):
    import datetime as dt

    from stac_fastapi_duckdb_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def h(x):
        return t0 + dt.timedelta(hours=x)

    left = spark.createDataFrame(
        [
            (1, h(0), h(5)),    # long interval spanning many granules
            (2, h(10), h(10.5)),
            (3, h(20), h(21)),
        ],
        "l_id long, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, h(1), h(2)),     # inside l1 (shares multiple granules)
            (11, h(4.5), h(6)),   # overlaps l1's tail
            (12, h(10.25), h(12)),  # overlaps l2
            (13, h(22), h(23)),   # disjoint from everything
            (14, h(5), h(7)),     # touches l1 exactly at the closed end
        ],
        "r_id long, rs timestamp, re timestamp",
    )
    out = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", granule_seconds=3600
    ).select("l_id", "r_id")
    got = sorted(map(tuple, out.collect()))
    # brute-force reference
    lrows = {r.l_id: (r.ls, r.le) for r in left.collect()}
    rrows = {r.r_id: (r.rs, r.re) for r in right.collect()}
    want = sorted(
        (li, ri)
        for li, (a, b) in lrows.items()
        for ri, (c, d) in rrows.items()
        if a <= d and c <= b
    )
    assert got == want                  # exact, including the closed-end touch
    assert len(got) == len(set(got))    # canonical-granule dedup: no duplicates
    assert (1, 13) not in got and (3, 13) not in got


def test_interval_overlap_join_is_equi_join_plan(spark):
    from stac_fastapi_duckdb_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from pyspark.sql import functions as F

    l = ev.limit(50).select(
        F.col("event_id").alias("l_id"),
        F.col("ts").cast("timestamp").alias("ls"),
        (F.col("ts").cast("timestamp") + F.expr("INTERVAL 1 HOUR")).alias("le"),
    )
    r = ev.limit(50).select(
        F.col("event_id").alias("r_id"),
        F.col("ts").cast("timestamp").alias("rs"),
        (F.col("ts").cast("timestamp") + F.expr("INTERVAL 2 HOURS")).alias("re"),
    )
    plan = (
        interval_overlap_join(l, r, "ls", "le", "rs", "re")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the granule trick must yield an equi-join, never a nested loop
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

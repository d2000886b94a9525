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

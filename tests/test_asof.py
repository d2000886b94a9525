"""As-of join: backward most-recent-match semantics, tie handling,
no-match NULLs."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.operators.asof import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(30)), (3, 2, _ts(10)), (4, 3, _ts(10))],
        "lid long, k long, t timestamp",
    )
    right = spark.createDataFrame(
        [(100, 1, _ts(5), "a"), (101, 1, _ts(20), "b"), (102, 2, _ts(50), "c")],
        "rid long, k long, rt timestamp, tag string",
    )
    got = {
        r.lid: (r.rid, r.tag)
        for r in asof_join(left, right, "k", "t", "rt").collect()
    }
    assert got[1] == (100, "a")        # latest right ≤ t(10) is rt(5)
    assert got[2] == (101, "b")        # rt(20) ≤ t(30)
    assert got[3] == (None, None)      # right exists only AFTER left time
    assert got[4] == (None, None)      # key has no right rows at all


def test_asof_tie_matches(spark):
    left = spark.createDataFrame([(1, 1, _ts(10))], "lid long, k long, t timestamp")
    right = spark.createDataFrame(
        [(100, 1, _ts(10), "x")], "rid long, k long, rt timestamp, tag string"
    )
    got = asof_join(left, right, "k", "t", "rt").collect()[0]
    assert got.rid == 100  # equal timestamps match (>= semantics)


def test_asof_preserves_left_rowcount(spark):
    from stac_fastapi_duckdb_spark.streaming import normalize_event_ts

    ev = normalize_event_ts(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    )
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"), "user_id", F.col("ts").alias("v_ts")
    )
    out = asof_join(clicks, views, "user_id", "ts", "v_ts", ["v_id"])
    assert out.count() == clicks.count()
    assert out.columns == ["event_id", "user_id", "ts", "v_id"]

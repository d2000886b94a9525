"""Skew utilities must be result-identical to their unsalted forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.functions import skew as K

SF = "/root/testdata/sf0.001"


def test_two_phase_agg_equals_direct(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = K.two_phase_agg(
        ev,
        ["event_type"],
        {
            "n": ("count", F.lit(1)),
            "sv": ("sum", F.col("value").cast("decimal(18,6)")),
            "mn": ("min", "value"),
            "mx": ("max", "value"),
        },
        buckets=8,
    )
    want = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_equals_plain(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "user_id", "value")
    users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("user_n"))
    )
    got = K.salted_join(ev, users, ["user_id"], buckets=4)
    want = ev.join(users, ["user_id"])
    assert sorted(map(tuple, got.select(want.columns).collect())) == sorted(
        map(tuple, want.collect())
    )


def test_salted_left_join_keeps_unmatched(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "user_id")
    some = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("user_id") < 5)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("user_n"))
    )
    got = K.salted_join(ev, some, ["user_id"], how="left", buckets=4)
    want = ev.join(some, ["user_id"], "left")
    assert got.count() == want.count()
    assert (
        got.filter(F.col("user_n").isNull()).count()
        == want.filter(F.col("user_n").isNull()).count()
    )


def test_skewed_key_stats(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    top = K.skewed_key_stats(ev, ["event_type"], top=3).collect()
    assert len(top) == 3
    assert top[0]["n"] >= top[1]["n"] >= top[2]["n"]
    assert 0 < top[0]["share"] <= 1

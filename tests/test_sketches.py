"""Approximate-aggregate sketches: the scale path for distincts and
quantiles when exact shuffles are too expensive. Accuracy is contracted
by relative-error bounds against exact answers (cross-engine value
oracles don't apply — sketch internals differ by implementation)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_hll_distinct_within_rsd(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact = ev.select(F.countDistinct("user_id")).collect()[0][0]
    approx = ev.select(
        F.approx_count_distinct("user_id", rsd=0.02)
    ).collect()[0][0]
    assert abs(approx - exact) / exact < 0.05


def test_approx_quantiles_within_epsilon(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    qs = li.approxQuantile("l_extendedprice", [0.25, 0.5, 0.75], 0.01)
    n = li.count()
    for q, v in zip([0.25, 0.5, 0.75], qs):
        # rank of the returned value must be within eps*n of the target
        rank = li.filter(F.col("l_extendedprice") <= v).count()
        assert abs(rank - q * n) <= 0.011 * n


def test_percentile_approx_groupwise(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("p50"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    for r in out.collect():
        assert r.mn <= r.p50 <= r.mx

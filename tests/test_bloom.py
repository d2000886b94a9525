"""functions/bloom.py: runtime bloom-filter injection + exact semi
reduction — join pruning must be observable in the plan AND leave
results untouched."""

from __future__ import annotations

from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.functions.bloom import (
    freeze_plan,
    bloom_filter_injected,
    enable_runtime_bloom,
    restore_confs,
    semi_reduce,
)

SF = "/root/testdata/sf0.001"


def test_runtime_bloom_injected_and_result_unchanged(spark):
    l = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_orderstatus") == "F"
    )
    joined = lambda: (
        l.join(o, l.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
    )
    prev = enable_runtime_bloom(
        spark, creation_side_max="100MB", application_side_min="0"
    )
    try:
        # injection requires a non-broadcastable build side
        prev["spark.sql.autoBroadcastJoinThreshold"] = spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        with_bloom = freeze_plan(joined())
        assert bloom_filter_injected(with_bloom)
    finally:
        restore_confs(spark, prev)
    # plan frozen under the old confs survives the restore...
    rows_bloom = {(r.o_orderpriority, r["count"]) for r in with_bloom.collect()}
    # ...and a fresh build sees the restored session (no leak)
    plain = joined()
    assert not bloom_filter_injected(plain)
    rows_plain = {(r.o_orderpriority, r["count"]) for r in plain.collect()}
    assert rows_bloom == rows_plain  # FP-only filter: results identical


def test_semi_reduce_exact_and_broadcast(spark):
    l = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_orderstatus") == "F"
    )
    reduced = semi_reduce(l, o, "l_orderkey", "o_orderkey")
    expected = (
        l.join(o.select("o_orderkey").distinct(), l.l_orderkey == F.col("o_orderkey"))
        .drop("o_orderkey")
    )
    assert reduced.count() == expected.count() > 0
    plan = reduced._jdf.queryExecution().executedPlan().toString()
    # keys broadcast; probe side is pruned without shuffling it
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan

"""Dataset-fingerprint validation operator (pipeline/validate.py):
order-invariance, sensitivity to single-row changes, null accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.pipeline.validate import (
    dataset_fingerprint,
    fingerprints_match,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fingerprint_is_order_and_partitioning_invariant(spark):
    rows = [(i, f"text number {i}") for i in range(100)]
    a = _docs(spark, rows)
    b = _docs(spark, list(reversed(rows))).repartition(7)
    assert fingerprints_match(dataset_fingerprint(a), dataset_fingerprint(b))


def test_fingerprint_detects_single_value_change(spark):
    rows = [(i, f"text number {i}") for i in range(50)]
    changed = list(rows)
    changed[17] = (17, "text number 17!")  # one char differs
    a = dataset_fingerprint(_docs(spark, rows))
    b = dataset_fingerprint(_docs(spark, changed))
    assert not fingerprints_match(a, b)
    # only the text column's hashes move; doc_id row is identical
    fa = {r.col_name: r for r in a.collect()}
    fb = {r.col_name: r for r in b.collect()}
    assert tuple(fa["doc_id"]) == tuple(fb["doc_id"])
    assert fa["text"].xor_hash != fb["text"].xor_hash


def test_fingerprint_detects_duplicate_swap(spark):
    # duplicate-row multiplicity changes that leave the SET of values
    # intact: xor alone is blind (x ^ x = 0), the modular sum is not
    a = _docs(spark, [(1, "a"), (1, "a"), (2, "b")])
    b = _docs(spark, [(1, "a"), (2, "b"), (2, "b")])
    fa = {r.col_name: r for r in dataset_fingerprint(a).collect()}
    fb = {r.col_name: r for r in dataset_fingerprint(b).collect()}
    assert fa["doc_id"].sum_hash != fb["doc_id"].sum_hash


def test_fingerprint_counts_nulls(spark):
    df = _docs(spark, [(1, "x"), (2, None), (3, None)])
    fp = {r.col_name: r for r in dataset_fingerprint(df).collect()}
    assert fp["text"].n_nulls == 2 and fp["doc_id"].n_nulls == 0
    assert fp["text"].n_rows == 3


def test_fingerprint_single_aggregation_pass(spark):
    # one scan, no join/window: the plan must contain exactly one
    # aggregate exchange (SinglePartition) and no shuffle on data keys
    df = _docs(spark, [(i, str(i)) for i in range(10)])
    plan = (
        dataset_fingerprint(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Window" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_distribution_drift_detects_shift(spark):
    from stac_fastapi_duckdb_spark.pipeline.validate import distribution_drift

    a = spark.createDataFrame([(float(v),) for v in [5, 15, 15, 25]], "v double")
    b_same = spark.createDataFrame([(float(v),) for v in [7, 12, 18, 22]], "v double")
    b_shift = spark.createDataFrame([(float(v),) for v in [45, 55, 55, 65]], "v double")

    def psi(x, y):
        return sum(r.psi_term for r in distribution_drift(x, y, "v", 10.0).collect())

    assert psi(a, b_same) < 0.1           # same bins, same proportions
    assert psi(a, b_shift) > 0.25          # fully disjoint bins
    # identical snapshots: exactly zero drift, positive zero
    rows = distribution_drift(a, a, "v", 10.0).collect()
    assert all(r.psi_term == 0.0 and str(r.psi_term) != "-0.0" for r in rows)
    assert all(r.n_a == r.n_b for r in rows)


def test_distribution_drift_handles_one_sided_bins(spark):
    from stac_fastapi_duckdb_spark.pipeline.validate import distribution_drift

    a = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    b = spark.createDataFrame([(100.0,)], "v double")
    rows = {r.bin: r for r in distribution_drift(a, b, "v", 10.0).collect()}
    assert rows[0].n_b == 0 and rows[10].n_a == 0
    for r in rows.values():
        assert r.psi_term == r.psi_term  # finite, not NaN


def test_profile_table_counts_and_minmax(spark):
    from stac_fastapi_duckdb_spark.pipeline.validate import profile_table

    df = spark.createDataFrame(
        [(1, "b"), (2, None), (3, "a"), (3, "a")],
        "doc_id long, text string",
    )
    p = {r.col_name: r for r in profile_table(df).collect()}
    assert p["doc_id"].n_rows == 4 and p["doc_id"].n_distinct == 3
    assert p["text"].n_nulls == 1 and p["text"].n_distinct == 2
    assert p["text"].min_str == "a" and p["text"].max_str == "b"
    assert p["doc_id"].min_str == "1" and p["doc_id"].max_str == "3"


def test_profile_table_single_pass_no_joins(spark):
    from stac_fastapi_duckdb_spark.pipeline.validate import profile_table

    df = spark.createDataFrame([(i, str(i)) for i in range(10)], "a long, b string")
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "EvalPython" not in plan


# ---------------------------------------------------------------------------
# trend_fit: exact-moment OLS
# ---------------------------------------------------------------------------

def test_trend_fit_recovers_a_perfect_line(spark):
    from stac_fastapi_duckdb_spark.pipeline.validate import trend_fit
    from pyspark.sql import functions as F

    # y = 2x + 5 exactly, x = 0..99
    df = spark.range(100).select(
        F.lit("g").alias("g"),
        F.col("id").alias("x"),
        (F.col("id") * 2 + 5).cast("double").alias("y"),
    )
    r = trend_fit(df, F.col("x"), F.col("y"), group_col="g").collect()[0]
    assert r["n"] == 100 and r["slope"] == 2.0
    assert r["intercept"] == 5.0 and r["r2"] == 1.0


def test_trend_fit_degenerate_groups_yield_nulls(spark):
    from stac_fastapi_duckdb_spark.pipeline.validate import trend_fit
    from pyspark.sql import functions as F

    df = spark.range(10).select(
        F.lit("g").alias("g"),
        F.lit(7).alias("x"),  # constant x: var = 0
        F.col("id").cast("double").alias("y"),
    )
    r = trend_fit(df, F.col("x"), F.col("y"), group_col="g").collect()[0]
    assert r["slope"] is None and r["intercept"] is None and r["r2"] is None


def test_trend_fit_partition_order_invariant(spark):
    # the point of exact-sum accumulation: identical bits regardless of
    # partitioning (float co-moment merges cannot promise this)
    from stac_fastapi_duckdb_spark.pipeline.validate import trend_fit
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    x = (F.unix_timestamp(F.col("ts").cast("timestamp")) - F.lit(1704067200))
    a = trend_fit(ev, x, F.col("value"), group_col="event_type")
    b = trend_fit(ev.repartition(29), x, F.col("value"), group_col="event_type")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------------------------
# snapshot_diff
# ---------------------------------------------------------------------------

def test_snapshot_diff_classifies_all_four_statuses(spark):
    from stac_fastapi_duckdb_spark.pipeline.validate import snapshot_diff

    a = spark.createDataFrame(
        [(1, "x", "en"), (2, "y", "en"), (3, "z", "de"), (4, "w", "fr")],
        "id long, text string, lang string",
    )
    b = spark.createDataFrame(
        [(1, "x", "en"), (2, "y2", "en"), (4, "w", "fr"), (5, "new", "en")],
        "id long, text string, lang string",
    )
    summary = {
        r["status"]: r["n"]
        for r in snapshot_diff(a, b, "id", ["text", "lang"]).collect()
    }
    assert summary == {"unchanged": 2, "changed": 1, "removed": 1, "added": 1}
    detail = {
        r["id"]: r["status"]
        for r in snapshot_diff(a, b, "id", ["text", "lang"], summary=False).collect()
    }
    assert detail == {2: "changed", 3: "removed", 5: "added"}


def test_snapshot_diff_null_is_a_value_not_a_wildcard(spark):
    from stac_fastapi_duckdb_spark.pipeline.validate import snapshot_diff

    a = spark.createDataFrame([(1, None), (2, "None")], "id long, v string")
    b = spark.createDataFrame([(1, None), (2, None)], "id long, v string")
    got = {
        r["status"]: r["n"] for r in snapshot_diff(a, b, "id", ["v"]).collect()
    }
    # NULL == NULL (unchanged); the string 'None' != NULL (changed)
    assert got == {"unchanged": 1, "changed": 1}


# ---------------------------------------------------------------------------
# rolling-count anomaly detection
# ---------------------------------------------------------------------------


def test_rolling_anomalies_flags_planted_spike(spark):
    from pyspark.sql import functions as F

    from stac_fastapi_duckdb_spark.pipeline.validate import (
        rolling_count_anomalies,
    )

    # type "a": 5 events/hour for 30 consecutive hours, except hour 20
    # which spikes to 50 (day offset keeps all 30 hours distinct)
    ev = spark.createDataFrame(
        [
            (i, f"2024-01-{1 + h // 24:02d} {h % 24:02d}:00:01", 1, "a")
            for i, h in enumerate(
                [h for h in range(30) for _ in range(50 if h == 20 else 5)]
            )
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    top = rolling_count_anomalies(ev, trailing=24, k=3).collect()
    # the spike deviates from a CONSTANT baseline: variance floor 1.0
    # gives z = 50 - 5 = 45 — it must rank first
    assert top[0].n == 50
    assert top[0].abs_z > 40
    assert top[0].abs_z > top[-1].abs_z


def test_rolling_anomalies_needs_two_trailing_points(spark):
    from pyspark.sql import functions as F

    from stac_fastapi_duckdb_spark.pipeline.validate import (
        rolling_count_anomalies,
    )

    # two hours only: the second has m=1 (< 2) → nothing qualifies
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:01", 1, "a"),
            (2, "2024-01-01 01:00:01", 1, "a"),
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    assert rolling_count_anomalies(ev).count() == 0


def test_rolling_anomalies_constant_rate_scores_zero(spark):
    from pyspark.sql import functions as F

    from stac_fastapi_duckdb_spark.pipeline.validate import (
        rolling_count_anomalies,
    )

    # perfectly constant rate: var floors to 1.0 and n == mean → z = 0
    ev = spark.createDataFrame(
        [
            (i * 10 + j, f"2024-01-01 {i:02d}:00:01", 1, "a")
            for i in range(10)
            for j in range(3)
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = rolling_count_anomalies(ev).collect()
    assert out and all(r.abs_z == 0.0 for r in out)

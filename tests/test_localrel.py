"""LocalRelation result construction (functions/localrel.py)."""

import math

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from stac_fastapi_duckdb_spark.functions.localrel import local_rows_df


def test_values_path_plans_local_table_scan(spark):
    df = local_rows_df(
        spark, [(1, 2.5), (2, -3.0)], "a long, b double"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "ExistingRDD" not in plan
    assert [tuple(r) for r in df.collect()] == [(1, 2.5), (2, -3.0)]


def test_exact_literal_round_trip(spark):
    rows = [
        (1, 0.1 + 0.2, None),
        (2, float("nan"), -5.0),
        (None, -0.0, 1e-300),
        (4, float("inf"), float("-inf")),
    ]
    got = [
        tuple(r)
        for r in local_rows_df(
            spark, rows, "a long, b double, c double"
        ).collect()
    ]
    assert got[0] == (1, 0.30000000000000004, None)
    assert got[1][0] == 2 and math.isnan(got[1][1]) and got[1][2] == -5.0
    # negative zero survives (the SQL parser reads a bare -0.0 as a
    # sign-less DECIMAL; the string cast preserves it)
    assert got[2][0] is None and repr(got[2][1]) == "-0.0"
    assert got[2][2] == 1e-300
    assert got[3] == (4, float("inf"), float("-inf"))


def test_safe_strings_take_values_path(spark):
    df = local_rows_df(
        spark,
        [(1, "view"), (2, "add to_cart-2.0"), (3, None)],
        StructType(
            [
                StructField("a", LongType()),
                StructField("s", StringType()),
            ]
        ),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert [tuple(r) for r in df.collect()] == [
        (1, "view"), (2, "add to_cart-2.0"), (3, None)
    ]


def test_unsafe_strings_fall_back(spark):
    # quotes/backslashes/control chars must NOT be inlined as SQL
    # literals — the fallback path returns them verbatim instead
    for bad in ("it's", 'a"b', "a\\b", "a\nb", "x；drop", "é"):
        df = local_rows_df(
            spark,
            [(1, bad)],
            StructType(
                [
                    StructField("a", LongType()),
                    StructField("s", StringType()),
                ]
            ),
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LocalTableScan" not in plan, bad
        assert [tuple(r) for r in df.collect()] == [(1, bad)]


def test_numpy_scalars_stay_exact(spark):
    # np.float64 subclasses float but its repr is not a bare literal
    # under numpy>=2 — the float() normalization inside _lit keeps the
    # VALUES path exact rather than emitting invalid SQL
    import numpy as np

    v = np.float64(0.1) + np.float64(0.2)
    df = local_rows_df(spark, [(1, v)], "a long, b double")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert df.collect()[0][1] == 0.30000000000000004


def test_empty_and_oversize_fall_back(spark):
    schema = StructType(
        [StructField("a", LongType()), StructField("b", DoubleType())]
    )
    assert local_rows_df(spark, [], schema).count() == 0
    big = [(i, float(i)) for i in range(1500)]
    df = local_rows_df(spark, big, schema)
    assert df.count() == 1500


def test_out_of_range_int_falls_back_not_wraps(spark):
    """An out-of-int32-range value must NOT take the VALUES path (with
    ANSI off the CAST would silently wrap where createDataFrame raises)
    — the two paths must fail/succeed identically. In-range extremes
    still take the VALUES path exactly."""
    import pytest
    from stac_fastapi_duckdb_spark.functions.localrel import _lit
    from pyspark.sql.types import IntegerType

    assert _lit(2**31, IntegerType()) is None
    assert _lit(-(2**31) - 1, IntegerType()) is None
    assert _lit(2**63, LongType()) is None
    assert _lit(-(2**63) - 1, LongType()) is None
    assert _lit(2**31 - 1, IntegerType()) == "CAST(2147483647 AS INT)"
    assert _lit(-(2**63), LongType()) == "CAST(-9223372036854775808 AS BIGINT)"
    schema = StructType(
        [StructField("a", IntegerType()), StructField("b", DoubleType())]
    )
    # both paths now agree: the fallback (createDataFrame) raises
    with pytest.raises(Exception):
        local_rows_df(spark, [(2**31, 1.0)], schema).collect()
    # extreme-but-valid values stay on the exact VALUES path
    df = local_rows_df(spark, [(2**31 - 1, 1.0)], schema)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert df.collect()[0][0] == 2**31 - 1

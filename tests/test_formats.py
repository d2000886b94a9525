"""CSV / NDJSON item-table sources (S1 breadth beyond the reference's
parquet-only read_parquet, /root/reference/stac_fastapi/duckdb/
config.py:112-121): extension-sniffed format, same search pipeline."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.operators.search import execute_search
from stac_fastapi_duckdb_spark.sources.catalog import (
    CollectionCatalog,
    _detect_format,
)


def test_detect_format():
    assert _detect_format(["/a/items.parquet"]) == "parquet"
    assert _detect_format(["/a/items.csv"]) == "csv"
    assert _detect_format(["/a/items.CSV.GZ"]) == "csv"
    assert _detect_format(["/a/items.ndjson", "/b/x.jsonl"]) == "json"
    with pytest.raises(ValueError, match="mixes formats"):
        _detect_format(["/a/items.csv", "/a/items.parquet"])


def _rows():
    return [
        {"id": f"it-{i:02d}", "geometry": None, "width": 10 * i,
         "datetime": f"2021-01-{i + 1:02d} 00:00:00"}
        for i in range(5)
    ]


@pytest.fixture(scope="module")
def csv_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fmt") / "items.csv"
    df = (
        spark.createDataFrame(
            [(r["id"], r["width"], r["datetime"]) for r in _rows()],
            "id string, width long, datetime string",
        )
        .withColumn("datetime", F.col("datetime").cast("timestamp"))
        # interval items carry (start) datetime + end_datetime; point
        # items leave end_datetime null — the operator needs the column
        .withColumn("end_datetime", F.col("datetime"))
    )
    df.coalesce(1).write.options(header=True).mode("overwrite").csv(str(d))
    return str(d)


@pytest.fixture(scope="module")
def ndjson_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fmt2") / "items.ndjson"
    df = spark.createDataFrame(
        [(r["id"], r["width"], json.dumps({"k": r["id"]})) for r in _rows()],
        "id string, width long, props string",
    )
    df.coalesce(1).write.mode("overwrite").json(str(d))
    return str(d)


def test_csv_collection_searchable(spark, csv_dir):
    cat = CollectionCatalog(spark, {"csvcoll": csv_dir})
    df = cat.items_df("csvcoll")
    assert {"id", "width", "datetime", "collection"} <= set(df.columns)
    # inferSchema must type the numeric column (filters push typed)
    assert dict(df.dtypes)["width"] == "int"
    rows, matched, _ = execute_search(
        cat,
        collection_ids=["csvcoll"],
        cql2_filter={"op": ">=", "args": [{"property": "width"}, 30]},
        sortby=[{"field": "width", "direction": "desc"}],
        limit=10,
    )
    assert matched == 2
    assert [r["id"] for r in rows] == ["it-04", "it-03"]


def test_csv_datetime_filter(spark, csv_dir):
    cat = CollectionCatalog(spark, {"csvcoll": csv_dir})
    # inferSchema types the ISO-ish column as timestamp → the datetime
    # operator's typed comparisons work unchanged
    assert dict(cat.items_df("csvcoll").dtypes)["datetime"] == "timestamp"
    rows, matched, _ = execute_search(
        cat,
        collection_ids=["csvcoll"],
        datetime_interval="2021-01-03T00:00:00Z/..",
        limit=10,
    )
    assert matched == 3


def test_ndjson_collection_searchable(spark, ndjson_dir):
    cat = CollectionCatalog(spark, {"jcoll": ndjson_dir})
    df = cat.items_df("jcoll")
    assert dict(df.dtypes)["width"] == "bigint"
    rows, matched, _ = execute_search(
        cat,
        collection_ids=["jcoll"],
        item_ids=["it-01", "it-03"],
        limit=10,
    )
    assert matched == 2 and {r["id"] for r in rows} == {"it-01", "it-03"}


def test_mixed_format_collection_rejected(spark, csv_dir):
    cat = CollectionCatalog(spark, {"bad": [csv_dir, "/x/items.parquet"]})
    with pytest.raises(ValueError, match="mixes formats"):
        cat.items_df("bad")


def test_http_non_parquet_rejected(spark):
    cat = CollectionCatalog(spark, {"bad": "https://example.com/items.csv"})
    with pytest.raises(ValueError, match="parquet-only"):
        cat.items_df("bad")


@pytest.fixture(scope="module")
def orc_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fmt3") / "items.orc"
    df = (
        spark.createDataFrame(
            [(r["id"], r["width"], r["datetime"]) for r in _rows()],
            "id string, width long, datetime string",
        )
        .withColumn("datetime", F.col("datetime").cast("timestamp"))
        .withColumn("end_datetime", F.col("datetime"))
    )
    df.coalesce(1).write.mode("overwrite").orc(str(d))
    return str(d)


def test_orc_collection_searchable(spark, orc_dir):
    assert _detect_format(["/a/items.orc"]) == "orc"
    cat = CollectionCatalog(spark, {"orccoll": orc_dir})
    df = cat.items_df("orccoll")
    # ORC keeps the written types exactly (no inference pass)
    assert dict(df.dtypes)["width"] == "bigint"
    rows, matched, _ = execute_search(
        cat,
        collection_ids=["orccoll"],
        cql2_filter={"op": ">=", "args": [{"property": "width"}, 30]},
        datetime_interval="2021-01-01T00:00:00Z/..",
        sortby=[{"field": "width", "direction": "desc"}],
        limit=10,
    )
    assert matched == 2
    assert [r["id"] for r in rows] == ["it-04", "it-03"]


def test_orc_filter_pushdown_reaches_scan(spark, orc_dir):
    cat = CollectionCatalog(spark, {"orccoll": orc_dir})
    df = cat.items_df("orccoll").filter(F.col("width") >= 30)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan orc" in plan and "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(width,30)" in plan

"""Queryables document (C13): static core fields + schema enrichment."""

from __future__ import annotations

from stac_fastapi_duckdb_spark.operators.queryables import (
    CORE_QUERYABLES,
    queryables,
)


def test_static_document():
    doc = queryables()
    assert doc["type"] == "object"
    assert set(CORE_QUERYABLES) <= set(doc["properties"])
    assert doc["properties"]["datetime"]["description"] == "Acquisition Timestamp"


def test_schema_enrichment(catalog):
    doc = queryables(catalog, "col-a")
    props = doc["properties"]
    # scalar parquet columns appear with JSON types; structural STAC
    # fields are not duplicated
    assert props["platform"] == {"description": "platform", "type": "string"}
    assert "geometry" in props and "$ref" in props["geometry"]
    assert "col-a" in doc["$id"]

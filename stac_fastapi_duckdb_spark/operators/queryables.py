"""Queryables document (Filter-extension conformance, SURVEY §2.3 C13).

Reference: static JSON schema of filterable fields
(``/root/reference/stac_fastapi/duckdb/filter_client.py:15-58``)
advertising id/collection/geometry/datetime. Improvement kept from the
survey note: the document is optionally ENRICHED from the scanned
parquet schema, so per-collection extra properties become visible
queryables instead of being silently filterable-but-unadvertised.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

from stac_fastapi_duckdb_spark.sources.catalog import CollectionCatalog

# mirror of the reference's static core queryables (filter_client.py:27-58)
CORE_QUERYABLES: dict[str, dict[str, Any]] = {
    "id": {
        "description": "ID",
        "$ref": "https://schemas.stacspec.org/v1.0.0/item-spec/json-schema/item.json#/definitions/core/allOf/2/properties/id",
    },
    "collection": {
        "description": "Collection",
        "$ref": "https://schemas.stacspec.org/v1.0.0/item-spec/json-schema/item.json#/definitions/core/allOf/2/then/properties/collection",
    },
    "geometry": {
        "description": "Geometry",
        "$ref": "https://schemas.stacspec.org/v1.0.0/item-spec/json-schema/item.json#/definitions/core/allOf/1/oneOf/0/properties/geometry",
    },
    "datetime": {
        "description": "Acquisition Timestamp",
        "$ref": "https://schemas.stacspec.org/v1.0.0/item-spec/json-schema/datetime.json#/properties/datetime",
    },
}

_SPARK_TO_JSON = {
    T.StringType: "string",
    T.BooleanType: "boolean",
    T.LongType: "integer",
    T.IntegerType: "integer",
    T.ShortType: "integer",
    T.DoubleType: "number",
    T.FloatType: "number",
    T.TimestampType: "string",
    T.DateType: "string",
}

_NON_QUERYABLE = {"id", "collection", "geometry", "type", "assets", "links"}


def queryables(
    catalog: CollectionCatalog | None = None,
    collection_id: str | None = None,
) -> dict:
    """The /queryables JSON-schema document. With a catalog, scalar
    columns of the collection's parquet schema (a zero-job metadata
    lookup, the Spark form of the reference's LIMIT-0 probe) are added
    as typed queryables."""
    props: dict[str, Any] = dict(CORE_QUERYABLES)
    cid = "queryables"
    if catalog is not None and collection_id is not None:
        cid = collection_id
        schema = catalog.items_df(collection_id).schema
        for field in schema.fields:
            if field.name in _NON_QUERYABLE or field.name in props:
                continue
            json_type = _SPARK_TO_JSON.get(type(field.dataType))
            if json_type is None:
                continue  # nested/array columns are not flat queryables
            props[field.name] = {
                "description": field.name,
                "type": json_type,
            }
    return {
        "$schema": "https://json-schema.org/draft/2019-09/schema",
        "$id": f"https://stac-api.example.com/collections/{cid}/queryables",
        "type": "object",
        "title": "Queryables",
        "properties": props,
        "additionalProperties": True,
    }

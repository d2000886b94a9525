"""Row → STAC Item (GeoJSON Feature) serialization.

Parity target: /root/reference/stac_fastapi/duckdb/utilities.py —
``decode_geometry`` (:13-21), ``convert_type`` (:24-111),
``create_stac_item`` (:114-288). Rules replicated exactly (SURVEY §1.3):

- ``geometry`` is the only hard-required field (:137-138); missing →
  ValueError.
- Special fields excluded from properties: {id, geometry, assets, links,
  type, bbox, stac_version, stac_extensions, collection} (:164-175).
- Every other non-null column becomes a ``properties`` entry
  (:189-215, :238-263); None values and empty arrays are DROPPED
  (:35,87,94).
- ``proj:*`` special-casing (:177-185,199-207): epsg → int, bbox/shape/
  transform → numeric lists.
- Envelope: type=Feature, stac_version=1.0.0 (:221-232); ``bbox``
  included only if a valid 4- or 6-list (:157-160, :234-236).

Under Arrow collection most numpy→python conversion is already done by
``Row.asDict``; ``convert_value`` keeps a slim version for the
None/empty-dropping and numpy/pandas scalars that survive.

Distributed variant: ``items_json_df`` serializes rows to JSON strings
fully JVM-side with ``to_json(struct(*))`` — the path a 100 TB export
job would take (no driver collect).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from typing import Any

import numpy as np

from stac_fastapi_duckdb_spark.functions import geo

SPECIAL_FIELDS = frozenset(
    {
        "id",
        "geometry",
        "assets",
        "links",
        "type",
        "bbox",
        "stac_version",
        "stac_extensions",
        "collection",
    }
)

_PROJ_INT_FIELDS = {"proj:epsg"}
_PROJ_ARRAY_FIELDS = {"proj:bbox", "proj:shape", "proj:transform"}


def _iso(dt: datetime) -> str:
    """ISO-8601 with Z suffix (utilities.py:66-74 formats isoformat)."""
    s = dt.isoformat()
    if dt.tzinfo is None:
        s += "Z"
    else:
        s = s.replace("+00:00", "Z")
    return s


def convert_value(value: Any) -> Any:
    """numpy/pandas → JSON-safe Python; returns None for droppable
    values (None, NaN/NaT, empty arrays) — utilities.py:24-111."""
    if value is None:
        return None
    if isinstance(value, (np.datetime64,)):
        ts = value.astype("datetime64[us]").astype(datetime)
        return _iso(ts) if isinstance(ts, datetime) else None
    if isinstance(value, datetime):
        return _iso(value)
    if isinstance(value, date):
        return value.isoformat()
    if isinstance(value, np.generic):
        value = value.item()
    if isinstance(value, float) and math.isnan(value):
        return None
    if isinstance(value, np.ndarray):
        if value.size == 0:
            return None  # empty arrays dropped (utilities.py:87,94)
        return [convert_value(v) for v in value.tolist()]
    if isinstance(value, (list, tuple)):
        if len(value) == 0:
            return None
        return [convert_value(v) for v in value]
    if isinstance(value, dict):
        return {k: convert_value(v) for k, v in value.items() if v is not None}
    if isinstance(value, (bytes, bytearray)):
        return list(value)
    return value


def _valid_bbox(bbox: Any) -> list[float] | None:
    """bbox kept only when a 4- or 6-element numeric list
    (utilities.py:157-160, 234-236)."""
    v = convert_value(bbox)
    if isinstance(v, list) and len(v) in (4, 6):
        try:
            return [float(x) for x in v]
        except (TypeError, ValueError):
            return None
    return None


def create_stac_item(row: dict[str, Any], collection_id: str | None = None) -> dict:
    """One result row (``Row.asDict(recursive=True)``) → STAC Item dict.

    Raises ValueError when ``geometry`` is missing — the reference logs
    and skips such rows (database_logic.py:960-1021 catches per-row).
    """
    geom_raw = row.get("geometry")
    if geom_raw is None:
        raise ValueError("Item has no geometry")  # utilities.py:137-147
    geometry = geo.to_geojson(geo.parse_wkb(geom_raw))

    properties: dict[str, Any] = {}
    for key, raw in row.items():
        if key in SPECIAL_FIELDS:
            continue
        if key in _PROJ_INT_FIELDS:  # utilities.py:177-185
            v = convert_value(raw)
            if v is not None:
                properties[key] = int(v)
            continue
        if key in _PROJ_ARRAY_FIELDS:  # utilities.py:199-207
            v = convert_value(raw)
            if v is not None:
                properties[key] = v
            continue
        if isinstance(raw, datetime) or isinstance(raw, np.datetime64):
            v = convert_value(raw)
        else:
            v = convert_value(raw)
        if v is not None:  # None-dropping parity (utilities.py:35)
            properties[key] = v

    item: dict[str, Any] = {
        "type": "Feature",  # envelope, utilities.py:221-232
        "stac_version": "1.0.0",
        "stac_extensions": convert_value(row.get("stac_extensions")) or [],
        "id": row.get("id"),
        "geometry": geometry,
        "properties": properties,
        "assets": convert_value(row.get("assets")) or {},
        "links": convert_value(row.get("links")) or [],
    }
    collection = row.get("collection") or collection_id
    if collection:
        item["collection"] = collection
    bbox = _valid_bbox(row.get("bbox"))
    if bbox is not None:
        item["bbox"] = bbox
    return item


def items_json_df(df, include: list[str] | None = None):
    """Distributed serialization: each row → one JSON string column
    ``item_json`` computed JVM-side (to_json over struct) — the export
    path that never funnels through the driver."""
    from pyspark.sql import functions as F

    cols = include or df.columns
    # binary geometry is not JSON-serializable JVM-side; hex-encode it
    struct_cols = [
        F.hex(F.col(c)).alias(c) if dict(df.dtypes)[c] == "binary" else F.col(c)
        for c in cols
    ]
    return df.select(
        F.to_json(F.struct(*struct_cols), {"ignoreNullFields": "true"}).alias(
            "item_json"
        )
    )

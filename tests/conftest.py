"""Shared fixtures: a session-scoped SparkSession and two synthetic STAC
collection parquet files modeled on FIXTURES.md §1 (which mirrors the
reference's io-lulc-9-class fixture, /root/reference/tests/conftest.py).

Row coverage requirements from FIXTURES.md:
- 2 collections with differing extra-property columns (unionByName).
- Rows with datetime set / start+end NULL, and datetime NULL /
  start+end set (both branches of database_logic.py:261-312).
- Geometries inside hit-bbox (-66,-16,-60,-8) and outside; none in
  (0,0,1,1); datetimes in 2019-2023, none after 2030.
- >11 rows for limit+1 pagination; NULL/duplicate/prefix-shared
  platform values for isNull/IN/LIKE.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from stac_fastapi_duckdb_spark.functions import geo

UTC = dt.timezone.utc


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small & fast for unit tests
    from stac_fastapi_duckdb_spark.session import get_spark

    s = get_spark("stac-spark-tests")
    yield s


def _ts(y, m, d, h=0):
    return dt.datetime(y, m, d, h, tzinfo=UTC)


def _col_a_rows():
    """20 items in collection col-a. Items 0-9 sit inside the canonical
    hit bbox (-66,-16,-60,-8); items 10-19 are far away (40..50, 40..50)."""
    rows = []
    for i in range(20):
        if i < 10:
            x, y = -65.0 + i * 0.4, -15.0 + i * 0.6
        else:
            x, y = 40.0 + i, 40.0 + (i - 10)
        poly = [(x, y), (x + 0.5, y), (x + 0.5, y + 0.5), (x, y + 0.5), (x, y)]
        has_instant = i % 3 != 0  # every 3rd row uses the interval branch
        rows.append(
            {
                "id": f"item-a-{i:03d}",
                "type": "Feature",
                "geometry": geo.polygon_wkb([poly]),
                "bbox": [x, y, x + 0.5, y + 0.5],
                "datetime": _ts(2019 + (i % 5), 1 + (i % 12), 1 + i % 27)
                if has_instant
                else None,
                "start_datetime": None if has_instant else _ts(2019, 1, 1),
                "end_datetime": None if has_instant else _ts(2022, 12, 31),
                "platform": ["landsat-8", "landsat-9", "sentinel-2", None][i % 4],
                "cloud_cover": float(i * 5 % 100) if i % 5 else None,
                "proj:epsg": 4326,
                "io:tile_id": f"tile-{i % 3}",
            }
        )
    return rows


def _col_b_rows():
    """8 items in collection col-b; different extra columns (gsd, no
    io:tile_id) to exercise unionByName with missing columns."""
    rows = []
    for i in range(8):
        x, y = -64.0 + i * 0.3, -14.0 + i * 0.3
        poly = [(x, y), (x + 0.2, y), (x + 0.2, y + 0.2), (x, y + 0.2), (x, y)]
        rows.append(
            {
                "id": f"item-b-{i:03d}",
                "type": "Feature",
                "geometry": geo.polygon_wkb([poly]),
                "bbox": [x, y, x + 0.2, y + 0.2],
                "datetime": _ts(2020, 6, 1 + i),
                "start_datetime": None,
                "end_datetime": None,
                "platform": "sentinel-2",
                "gsd": 10.0 + i,
            }
        )
    return rows


def _write_parquet(rows: list[dict], path: str) -> None:
    cols = {}
    for key in rows[0]:
        cols[key] = [r.get(key) for r in rows]
    arrays = {}
    for key, vals in cols.items():
        if key == "geometry":
            arrays[key] = pa.array(vals, type=pa.binary())
        elif key == "bbox":
            arrays[key] = pa.array(vals, type=pa.list_(pa.float64()))
        elif key in ("datetime", "start_datetime", "end_datetime"):
            arrays[key] = pa.array(vals, type=pa.timestamp("us", tz="UTC"))
        elif key == "proj:epsg":
            arrays[key] = pa.array(vals, type=pa.int32())
        else:
            arrays[key] = pa.array(vals)
    pq.write_table(pa.table(arrays), path)


@pytest.fixture(scope="session")
def stac_dirs(tmp_path_factory):
    """→ (parquet_urls dict, stac_file_path) for two collections."""
    base = tmp_path_factory.mktemp("stac")
    pq_dir = base / "parquet"
    doc_dir = base / "collections"
    pq_dir.mkdir()
    doc_dir.mkdir()

    _write_parquet(_col_a_rows(), str(pq_dir / "col-a.parquet"))
    _write_parquet(_col_b_rows(), str(pq_dir / "col-b.parquet"))

    for cid in ("col-a", "col-b", "col-no-items"):
        d = doc_dir / cid
        d.mkdir()
        (d / "collection.json").write_text(
            json.dumps(
                {
                    "type": "Collection",
                    "id": cid,
                    "stac_version": "1.0.0",
                    "description": f"test collection {cid}",
                    "license": "proprietary",
                    "extent": {
                        "spatial": {"bbox": [[-180, -90, 180, 90]]},
                        "temporal": {
                            "interval": [["2017-01-01T00:00:00Z", None]]
                        },
                    },
                    "links": [],
                }
            )
        )

    urls = {
        "col-a": str(pq_dir / "col-a.parquet"),
        "col-b": str(pq_dir / "col-b.parquet"),
    }
    return urls, str(doc_dir)


@pytest.fixture()
def catalog(spark, stac_dirs):
    from stac_fastapi_duckdb_spark.sources.catalog import CollectionCatalog

    urls, doc_dir = stac_dirs
    return CollectionCatalog(spark, urls, doc_dir)

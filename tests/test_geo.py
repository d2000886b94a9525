"""Unit tests for the pure-Python geometry kernel (functions/geo.py)."""

import numpy as np
import pytest

from stac_fastapi_duckdb_spark.functions import geo


def test_point_wkb_roundtrip():
    kind, val = geo.parse_wkb(geo.point_wkb(1.5, -2.5))
    assert kind == "point"
    assert val == (1.5, -2.5)


def test_polygon_wkb_roundtrip():
    ring = [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]
    kind, val = geo.parse_wkb(geo.polygon_wkb([ring]))
    assert kind == "polygons"
    assert np.allclose(val[0][0], np.asarray(ring, dtype=float))


def test_parse_wkb_accepts_int_list():
    # reference utilities.py:13-21 receives WKB as a list of ints
    buf = list(geo.point_wkb(3.0, 4.0))
    assert geo.parse_wkb(buf) == ("point", (3.0, 4.0))


def test_geojson_roundtrip_polygon():
    gj = {"type": "Polygon", "coordinates": [[[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]]}
    geom = geo.from_geojson(gj)
    assert geo.to_geojson(geom)["type"] == "Polygon"


def test_bounds():
    g = geo.from_geojson(
        {"type": "Polygon", "coordinates": [[[1, 2], [5, 2], [5, 7], [1, 7], [1, 2]]]}
    )
    assert geo.bounds(g) == (1, 2, 5, 7)


@pytest.mark.parametrize(
    "a,b,expected",
    [
        # overlapping boxes
        ((0, 0, 4, 4), (2, 2, 6, 6), True),
        # disjoint boxes
        ((0, 0, 1, 1), (5, 5, 6, 6), False),
        # touching at an edge counts as intersecting
        ((0, 0, 2, 2), (2, 0, 4, 2), True),
        # containment without edge crossing
        ((0, 0, 10, 10), (3, 3, 4, 4), True),
    ],
)
def test_box_intersects(a, b, expected):
    ga = geo.bbox_to_polygon(*a)
    gb = geo.bbox_to_polygon(*b)
    assert geo.intersects(ga, gb) is expected
    assert geo.intersects(gb, ga) is expected


def test_point_in_polygon_with_hole():
    outer = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    hole = [(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)]
    poly = geo.from_geojson(
        {"type": "Polygon", "coordinates": [outer, hole]}
    )
    inside = ("point", (2.0, 2.0))
    in_hole = ("point", (5.0, 5.0))
    outside = ("point", (20.0, 20.0))
    assert geo.intersects(inside, poly)
    assert not geo.intersects(in_hole, poly)
    assert not geo.intersects(outside, poly)


def test_line_polygon_intersects():
    poly = geo.bbox_to_polygon(0, 0, 4, 4)
    crossing = geo.from_geojson(
        {"type": "LineString", "coordinates": [[-1, 2], [5, 2]]}
    )
    inside = geo.from_geojson(
        {"type": "LineString", "coordinates": [[1, 1], [2, 2]]}
    )
    away = geo.from_geojson(
        {"type": "LineString", "coordinates": [[10, 10], [12, 12]]}
    )
    assert geo.intersects(crossing, poly)
    assert geo.intersects(inside, poly)
    assert not geo.intersects(away, poly)


def test_multipolygon_geojson():
    mp = geo.from_geojson(
        {
            "type": "MultiPolygon",
            "coordinates": [
                [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
                [[[5, 5], [6, 5], [6, 6], [5, 6], [5, 5]]],
            ],
        }
    )
    probe = geo.bbox_to_polygon(5.2, 5.2, 5.8, 5.8)
    assert geo.intersects(mp, probe)
    assert geo.to_geojson(mp)["type"] == "MultiPolygon"

"""functions/geo_sedona.py: the optional Sedona gate must stay inert
without the package+opt-in, and its expression builders must emit the
documented Catalyst forms."""

from __future__ import annotations

from stac_fastapi_duckdb_spark.functions import geo_sedona


def test_gate_is_inert_here(monkeypatch):
    # no sedona in this container → disabled regardless of env
    monkeypatch.setenv("SPARK_GRAFT_USE_SEDONA", "1")
    assert not geo_sedona.sedona_available()
    assert not geo_sedona.sedona_enabled()


def test_gate_requires_explicit_opt_in(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_USE_SEDONA", raising=False)
    assert not geo_sedona.sedona_enabled()  # even if the package existed


def test_try_register_falls_back_cleanly(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_USE_SEDONA", "1")
    assert geo_sedona.try_register(spark) is False  # pandas-UDF path stays


def test_intersects_expr_shape_and_escaping():
    geom = {"type": "Point", "coordinates": [1.0, 2.0]}
    c = geo_sedona.intersects_geojson_expr(geom, "geometry")
    s = str(c)
    assert "ST_Intersects" in s and "ST_GeomFromWKB" in s
    assert "`geometry`" in s
    # quotes in the payload are escaped (no SQL-literal breakout)
    evil = {"type": "Point", "coordinates": [1.0, 2.0], "x": "a'b"}
    assert "\\'" in str(geo_sedona.intersects_geojson_expr(evil, "geometry"))


def test_bbox_expr_shape():
    s = str(geo_sedona.bbox_intersects_expr(-10.0, -5.0, 10.0, 5.0, "geometry"))
    assert "ST_PolygonFromEnvelope(-10.0, -5.0, 10.0, 5.0)" in s


def test_spatial_path_unchanged_with_gate_env_set(catalog, monkeypatch):
    # with the env flag on but no sedona installed, search must still
    # produce the pandas-UDF-refined result
    from stac_fastapi_duckdb_spark.operators.search import execute_search

    monkeypatch.setenv("SPARK_GRAFT_USE_SEDONA", "1")
    items, matched, _ = execute_search(
        catalog, collection_ids=["col-a"], bbox=[-66, -16, -60, -8], limit=100
    )
    assert matched == 10


# ---------------------------------------------------------------------------
# Golden-WKB semantic pinning: Sedona JARs are unobtainable in this
# sandbox, so the gated JVM path cannot EXECUTE — but its semantics can
# be pinned. For a table of hand-verified (item WKB, query GeoJSON) →
# intersects goldens we assert (a) the pure refine engine
# (functions/geo.py) reproduces every golden, and (b) the Sedona
# expressions embed EXACTLY the same operands (the GeoJSON payload
# round-trips byte-identically; the envelope polygon has the same
# corners the pure bbox path uses) — so the only way the gated path
# could diverge on a cluster is Sedona's own documented ST_Intersects
# deviating from the OGC semantics these goldens encode.
# ---------------------------------------------------------------------------

import json as _json
import struct as _struct


def _wkb_point(x, y):
    return _struct.pack("<BIdd", 1, 1, x, y)


def _wkb_polygon(*rings):
    out = _struct.pack("<BII", 1, 3, len(rings))
    for ring in rings:
        out += _struct.pack("<I", len(ring))
        for x, y in ring:
            out += _struct.pack("<dd", x, y)
    return out


def _wkb_linestring(pts):
    out = _struct.pack("<BII", 1, 2, len(pts))
    for x, y in pts:
        out += _struct.pack("<dd", x, y)
    return out


_SQ = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
_HOLE = [(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)]

# (name, item WKB, query GeoJSON, expected ST_Intersects result)
GOLDEN_WKB_CASES = [
    ("point_inside", _wkb_point(5, 5),
     {"type": "Polygon", "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]]}, True),
    ("point_outside", _wkb_point(15, 5),
     {"type": "Polygon", "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]]}, False),
    ("point_on_edge", _wkb_point(10, 5),
     {"type": "Polygon", "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]]}, True),
    ("point_on_vertex", _wkb_point(0, 0),
     {"type": "Polygon", "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]]}, True),
    ("point_in_hole", _wkb_polygon(_SQ, _HOLE),
     {"type": "Point", "coordinates": [5, 5]}, False),
    ("point_in_shell", _wkb_polygon(_SQ, _HOLE),
     {"type": "Point", "coordinates": [2, 2]}, True),
    ("polys_overlap", _wkb_polygon(_SQ),
     {"type": "Polygon", "coordinates": [[[5, 5], [15, 5], [15, 15], [5, 15], [5, 5]]]}, True),
    ("polys_touch_edge", _wkb_polygon(_SQ),
     {"type": "Polygon", "coordinates": [[[10, 0], [20, 0], [20, 10], [10, 10], [10, 0]]]}, True),
    ("polys_touch_corner", _wkb_polygon(_SQ),
     {"type": "Polygon", "coordinates": [[[10, 10], [20, 10], [20, 20], [10, 20], [10, 10]]]}, True),
    ("polys_disjoint", _wkb_polygon(_SQ),
     {"type": "Polygon", "coordinates": [[[20, 20], [30, 20], [30, 30], [20, 30], [20, 20]]]}, False),
    ("poly_contains_query", _wkb_polygon(_SQ),
     {"type": "Polygon", "coordinates": [[[2, 2], [3, 2], [3, 3], [2, 3], [2, 2]]]}, True),
    ("line_crosses", _wkb_linestring([(-5.0, 5.0), (15.0, 5.0)]),
     {"type": "Polygon", "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]]}, True),
    ("line_outside", _wkb_linestring([(-5.0, -5.0), (-1.0, -1.0)]),
     {"type": "Polygon", "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]]}, False),
    ("line_touches_boundary", _wkb_linestring([(10.0, -5.0), (10.0, 15.0)]),
     {"type": "Polygon", "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]]}, True),
    ("multipolygon_query", _wkb_point(25, 25),
     {"type": "MultiPolygon", "coordinates": [
         [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]],
         [[[20, 20], [30, 20], [30, 30], [20, 30], [20, 20]]]]}, True),
]


def test_pure_refine_matches_golden_wkb():
    from stac_fastapi_duckdb_spark.functions import geo

    for name, wkb, query, want in GOLDEN_WKB_CASES:
        got = geo.intersects(geo.parse_wkb(wkb), geo.from_geojson(query))
        assert got == want, f"{name}: pure refine says {got}, golden {want}"


def test_sedona_expr_operands_match_golden_cases():
    """The gated expression must feed Sedona the IDENTICAL operands the
    pure path evaluated: the embedded GeoJSON round-trips to the same
    object, and the geometry column reference is the WKB column."""
    for name, _wkb, query, _want in GOLDEN_WKB_CASES:
        s = str(geo_sedona.intersects_geojson_expr(query, "geometry"))
        assert "ST_Intersects(ST_GeomFromWKB(`geometry`)" in s, name
        # extract the quoted payload back out of the expression string
        # (escaped inner quotes mean the literal closes at the first '))
        payload = s.split("ST_GeomFromGeoJSON(", 1)[1]
        payload = payload[1 : payload.index("'))")]
        assert _json.loads(payload.replace("\\'", "'").replace("\\\\", "\\")) == query, name


def test_sedona_bbox_envelope_matches_pure_bbox_polygon():
    """bbox_intersects_expr's envelope corners must be the same w/s/e/n
    rectangle the pure path (operators/spatial.bbox_predicate) refines
    against."""
    w, s_, e, n = -66.0, -16.0, -60.0, -8.0
    expr = str(geo_sedona.bbox_intersects_expr(w, s_, e, n, "geometry"))
    assert f"ST_PolygonFromEnvelope({w!r}, {s_!r}, {e!r}, {n!r})" in expr

    # and that rectangle, evaluated by the pure engine, behaves as the
    # envelope: centre in, far point out, boundary point in
    from stac_fastapi_duckdb_spark.functions import geo

    rect = {"type": "Polygon", "coordinates": [
        [[w, s_], [e, s_], [e, n], [w, n], [w, s_]]]}
    g = geo.from_geojson(rect)
    assert geo.intersects(g, ("point", (-63.0, -12.0)))
    assert not geo.intersects(g, ("point", (0.0, 0.0)))
    assert geo.intersects(g, ("point", (w, -12.0)))

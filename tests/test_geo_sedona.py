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

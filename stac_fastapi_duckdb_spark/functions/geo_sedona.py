"""Optional Apache Sedona acceleration for the spatial predicates.

The engine's default spatial path (operators/spatial.py) is a JVM
envelope prefilter + an Arrow-batched exact refine — correct and
dependency-free. On a cluster with Apache Sedona installed (pip
``apache-sedona`` + its Spark JARs), the refine can instead run fully
JVM-side as Catalyst expressions (``ST_Intersects`` over
``ST_GeomFromWKB``), keeping the whole predicate inside whole-stage
codegen and letting Sedona's own optimizer rules kick in for GeoParquet
(reference uses the equivalent DuckDB ``spatial`` extension —
reference ``config.py:123-137``, predicates ``database_logic.py:401,441``).

This container has no Sedona, so everything here is import-gated: the
module is inert (``sedona_enabled() -> False``) unless both the package
and its JARs resolve AND ``SPARK_GRAFT_USE_SEDONA=1`` is set. The
expression builders are pure string/Column construction and are tested
without Sedona.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

_REGISTERED: set[int] = set()


def sedona_available() -> bool:
    """True when the apache-sedona Python package is importable. (JAR
    availability is only proven by ``try_register``.)"""
    try:
        import sedona  # noqa: F401

        return True
    except ImportError:
        return False


def sedona_enabled() -> bool:
    """Gate: package present AND explicitly opted in via env."""
    return os.environ.get("SPARK_GRAFT_USE_SEDONA") == "1" and sedona_available()


def try_register(spark: SparkSession) -> bool:
    """Register Sedona's ST_* functions on the session (idempotent).
    Returns False — leaving the pandas-UDF path in charge — if the
    package or its JVM side is missing."""
    if not sedona_enabled():
        return False
    if id(spark) in _REGISTERED:
        return True
    try:
        from sedona.spark import SedonaContext

        SedonaContext.create(spark)
        _REGISTERED.add(id(spark))
        return True
    except Exception:
        return False


def _sql_quote(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


def intersects_geojson_expr(geometry: dict, geometry_col: str) -> Column:
    """``ST_Intersects(ST_GeomFromWKB(col), ST_GeomFromGeoJSON('...'))``
    as a Column — the JVM-side exact predicate (valid only after
    ``try_register`` succeeded). GeoJSON is serialized with json.dumps
    and quote-escaped; the column name is backtick-quoted."""
    gj = _sql_quote(json.dumps(geometry))
    return F.expr(
        f"ST_Intersects(ST_GeomFromWKB(`{geometry_col}`),"
        f" ST_GeomFromGeoJSON('{gj}'))"
    )


def bbox_intersects_expr(
    w: float, s: float, e: float, n: float, geometry_col: str
) -> Column:
    """``ST_Intersects(geom, ST_PolygonFromEnvelope(w,s,e,n))`` — the
    Sedona form of the reference's bbox WKT polygon predicate."""
    return F.expr(
        f"ST_Intersects(ST_GeomFromWKB(`{geometry_col}`),"
        f" ST_PolygonFromEnvelope({w!r}, {s!r}, {e!r}, {n!r}))"
    )

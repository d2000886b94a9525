"""STAC API HTTP application over the Spark search engine.

Mirrors the reference server's route surface and behaviors
(``/root/reference/stac_fastapi/duckdb/app.py:25-72`` — StacApi wiring
with the Fields / Query / Sort / Filter extensions;
``filter_client.py:15-58`` — queryables endpoints), re-expressed over
``execute_search`` / ``get_one_item`` / ``queryables``:

- ``GET /``                                  landing page
- ``GET /conformance``                       conformance classes
- ``GET /collections``                       collection list
- ``GET /collections/{cid}``                 one collection document
- ``GET /collections/{cid}/items``           item search scoped to one
  collection (bbox, datetime, limit, token, sortby, fields)
- ``GET /collections/{cid}/items/{iid}``     single item
- ``GET|POST /search``                       cross-collection search
  (collections, ids, bbox, intersects, datetime, limit, token, sortby,
  fields, query, filter)
- ``GET /queryables`` and
  ``GET /collections/{cid}/queryables``      Filter-extension schema

Framework note: the reference uses FastAPI; this container ships Flask
(FastAPI/starlette are not installed), so the app is a Flask blueprint
with identical routes, payloads, and status-code semantics — the HTTP
surface, not the framework, is the contract. Validation errors map to
400 (the reference's pydantic layer emits 400/422; its own API tests
accept either), missing resources to 404.

Search execution itself stays entirely in the engine: each request
compiles to one Catalyst plan (filters pushed to the parquet scan,
Fields projection pruned at the reader, TakeOrderedAndProject for
sorted pages) — the HTTP layer is glue, not a second query engine.
"""

from __future__ import annotations

import json
from typing import Any

from flask import Flask, Response, jsonify, request

from stac_fastapi_duckdb_spark.errors import InvalidQueryError, NotFoundError
from stac_fastapi_duckdb_spark.operators.queryables import queryables
from stac_fastapi_duckdb_spark.operators.search import execute_search, get_one_item
from stac_fastapi_duckdb_spark.sources.catalog import CollectionCatalog
from stac_fastapi_duckdb_spark.stac.serialize import create_stac_item

STAC_VERSION = "1.0.0"

# Public STAC API + OGC conformance URIs — the set the reference
# advertises via stac-fastapi core plus its explicitly appended
# ADVANCED_COMPARISON_OPERATORS (reference app.py:29-31)
CONFORMANCE_CLASSES = [
    "https://api.stacspec.org/v1.0.0/core",
    "https://api.stacspec.org/v1.0.0/ogcapi-features",
    "https://api.stacspec.org/v1.0.0/item-search",
    "https://api.stacspec.org/v1.0.0/item-search#fields",
    "https://api.stacspec.org/v1.0.0/item-search#query",
    "https://api.stacspec.org/v1.0.0/item-search#sort",
    "https://api.stacspec.org/v1.0.0/item-search#filter",
    "http://www.opengis.net/spec/ogcapi-features-1/1.0/conf/core",
    "http://www.opengis.net/spec/ogcapi-features-1/1.0/conf/geojson",
    "http://www.opengis.net/spec/cql2/1.0/conf/cql2-json",
    "http://www.opengis.net/spec/cql2/1.0/conf/cql2-text",
    "http://www.opengis.net/spec/cql2/1.0/conf/basic-cql2",
    "https://api.stacspec.org/v0.3.0/aggregation",
    "http://www.opengis.net/spec/cql2/1.0/conf/advanced-comparison-operators",
]


# ---------------------------------------------------------------------------
# request parsing (GET query-string forms of the extension inputs)
# ---------------------------------------------------------------------------

def _parse_bbox(raw: str | None) -> list[float] | None:
    if raw is None:
        return None
    try:
        return [float(x) for x in raw.split(",")]
    except ValueError:
        raise InvalidQueryError(f"Invalid bbox {raw!r}")


def _parse_limit(raw: str | None, default: int = 10) -> int:
    if raw is None:
        return default
    try:
        return int(raw)
    except ValueError:
        raise InvalidQueryError(f"Invalid limit {raw!r}")


def _parse_csv(raw: str | None) -> list[str] | None:
    if raw is None:
        return None
    return [s for s in (p.strip() for p in raw.split(",")) if s]


def _parse_json_param(raw: str | None, name: str) -> Any:
    if raw is None:
        return None
    try:
        return json.loads(raw)
    except ValueError:
        raise InvalidQueryError(f"Invalid JSON in {name!r}")


def _parse_filter(raw: str | None, lang: str | None) -> dict | None:
    """Filter-extension GET param: ``filter-lang`` selects the encoding.

    Per the STAC API Filter extension, the GET default encoding is
    cql2-text; JSON is accepted when ``filter-lang=cql2-json`` (and,
    for backward compatibility with clients that sent JSON without a
    lang, when the value parses as a JSON object). Both encodings land
    on the same dict AST → one Column compiler (operators/cql2.py).
    """
    if raw is None:
        return None
    from stac_fastapi_duckdb_spark.operators.cql2_text import parse_cql2_text

    if lang == "cql2-json":
        return _parse_json_param(raw, "filter")
    if lang not in (None, "cql2-text"):
        raise InvalidQueryError(f"Unsupported filter-lang {lang!r}")
    if lang is None:
        try:
            parsed = json.loads(raw)
        except ValueError:
            parsed = None
        if isinstance(parsed, dict):
            return parsed
    return parse_cql2_text(raw)


def _parse_fields(raw: str | None) -> dict | None:
    """Fields-extension GET syntax: ``a,b,-c`` — bare/'+' names include,
    '-' names exclude; exclusions-only keeps everything else."""
    parts = _parse_csv(raw)
    if parts is None:
        return None
    include = [p.lstrip("+") for p in parts if not p.startswith("-")]
    exclude = [p[1:] for p in parts if p.startswith("-")]
    out: dict[str, Any] = {}
    if include:
        out["include"] = include
    if exclude:
        out["exclude"] = exclude
    return out or None


def _serialize_items(rows: list[dict]) -> list[dict]:
    """Rows → STAC Items; geometry-less rows are skipped, matching the
    reference's log-and-skip per-row serialization
    (database_logic.py:960-1021)."""
    out = []
    for row in rows:
        try:
            out.append(create_stac_item(row))
        except ValueError:
            continue
    return out


def _item_collection(
    items: list[dict], matched: int | None, next_token: str | None, href: str
) -> dict:
    links = [{"rel": "self", "type": "application/geo+json", "href": href}]
    if next_token is not None:
        links.append(
            {
                "rel": "next",
                "type": "application/geo+json",
                "href": href,
                "body": {"token": next_token},
                "token": next_token,
            }
        )
    return {
        "type": "FeatureCollection",
        "features": items,
        "links": links,
        "numMatched": matched,
        "numReturned": len(items),
    }


def _minimal_collection_doc(cid: str) -> dict:
    """Fallback collection document when no STAC_FILE_PATH tree exists —
    the registry still defines the collection set."""
    return {
        "type": "Collection",
        "id": cid,
        "stac_version": STAC_VERSION,
        "description": cid,
        "license": "proprietary",
        "extent": {
            "spatial": {"bbox": [[-180, -90, 180, 90]]},
            "temporal": {"interval": [[None, None]]},
        },
        "links": [],
    }


# ---------------------------------------------------------------------------
# app factory
# ---------------------------------------------------------------------------

def create_app(
    catalog: CollectionCatalog,
    *,
    title: str = "stac-fastapi-duckdb-spark",
    description: str = "STAC API over a PySpark analytics engine",
    api_version: str = "0.0.1",
) -> Flask:
    app = Flask(title)

    # ------------------------------------------------------------------
    # error mapping (reference: pydantic/validation → 400/422,
    # NotFoundError → 404 — core.py semantics)
    # ------------------------------------------------------------------
    @app.errorhandler(InvalidQueryError)
    def _invalid(exc: InvalidQueryError) -> tuple[Response, int]:
        return jsonify({"code": 400, "description": str(exc)}), 400

    @app.errorhandler(NotFoundError)
    def _missing(exc: NotFoundError) -> tuple[Response, int]:
        return jsonify({"code": 404, "description": str(exc)}), 404

    # ------------------------------------------------------------------
    # landing + conformance
    # ------------------------------------------------------------------
    @app.get("/")
    def landing() -> Response:
        base = request.url_root.rstrip("/")
        return jsonify(
            {
                "type": "Catalog",
                "id": title,
                "stac_version": STAC_VERSION,
                "description": description,
                "api_version": api_version,
                "conformsTo": CONFORMANCE_CLASSES,
                "links": [
                    {"rel": "self", "type": "application/json", "href": base + "/"},
                    {"rel": "conformance", "type": "application/json", "href": base + "/conformance"},
                    {"rel": "data", "type": "application/json", "href": base + "/collections"},
                    {"rel": "search", "type": "application/geo+json", "href": base + "/search", "method": "GET"},
                    {"rel": "search", "type": "application/geo+json", "href": base + "/search", "method": "POST"},
                    {"rel": "http://www.opengis.net/def/rel/ogc/1.0/queryables", "type": "application/schema+json", "href": base + "/queryables"},
                ],
            }
        )

    @app.get("/conformance")
    def conformance() -> Response:
        return jsonify({"conformsTo": CONFORMANCE_CLASSES})

    # ------------------------------------------------------------------
    # collections
    # ------------------------------------------------------------------
    @app.get("/collections")
    def all_collections() -> Response:
        docs = catalog.all_collections()
        if not docs:
            docs = [_minimal_collection_doc(c) for c in catalog.collection_ids()]
        return jsonify({"collections": docs, "links": []})

    @app.get("/collections/<cid>")
    def one_collection(cid: str) -> Response:
        try:
            return jsonify(catalog.find_collection(cid))
        except NotFoundError:
            if cid in catalog.collection_ids():
                return jsonify(_minimal_collection_doc(cid))
            raise

    # ------------------------------------------------------------------
    # items (collection-scoped search — reference item_collection route)
    # ------------------------------------------------------------------
    @app.get("/collections/<cid>/items")
    def collection_items(cid: str) -> Response:
        catalog.items_df(cid)  # 404 for unknown collections before searching
        items, matched, next_token = execute_search(
            catalog,
            collection_ids=[cid],
            bbox=_parse_bbox(request.args.get("bbox")),
            datetime_interval=request.args.get("datetime"),
            sortby=_parse_csv(request.args.get("sortby")),
            fields=_parse_fields(request.args.get("fields")),
            limit=_parse_limit(request.args.get("limit")),
            token=request.args.get("token"),
        )
        return jsonify(
            _item_collection(
                _serialize_items(items), matched, next_token, request.url
            )
        )

    @app.get("/collections/<cid>/items/<iid>")
    def one_item(cid: str, iid: str) -> Response:
        return jsonify(create_stac_item(get_one_item(catalog, cid, iid)))

    # ------------------------------------------------------------------
    # search (GET + POST)
    # ------------------------------------------------------------------
    @app.get("/search")
    def search_get() -> Response:
        items, matched, next_token = execute_search(
            catalog,
            collection_ids=_parse_csv(request.args.get("collections")),
            item_ids=_parse_csv(request.args.get("ids")),
            bbox=_parse_bbox(request.args.get("bbox")),
            intersects=_parse_json_param(request.args.get("intersects"), "intersects"),
            datetime_interval=request.args.get("datetime"),
            cql2_filter=_parse_filter(
                request.args.get("filter"), request.args.get("filter-lang")
            ),
            query=_parse_json_param(request.args.get("query"), "query"),
            sortby=_parse_csv(request.args.get("sortby")),
            fields=_parse_fields(request.args.get("fields")),
            limit=_parse_limit(request.args.get("limit")),
            token=request.args.get("token"),
        )
        return jsonify(
            _item_collection(
                _serialize_items(items), matched, next_token, request.url
            )
        )

    @app.post("/search")
    def search_post() -> Response:
        body = request.get_json(silent=True)
        if not isinstance(body, dict):
            raise InvalidQueryError("Search body must be a JSON object")
        limit = body.get("limit", 10)
        if not isinstance(limit, int) or isinstance(limit, bool):
            raise InvalidQueryError(f"Invalid limit {limit!r}")
        bbox = body.get("bbox")
        if bbox is not None and not isinstance(bbox, (list, tuple)):
            raise InvalidQueryError(f"Invalid bbox {bbox!r}")
        flt = body.get("filter")
        flt_lang = body.get("filter-lang")
        if flt_lang == "cql2-text" or (flt_lang is None and isinstance(flt, str)):
            from stac_fastapi_duckdb_spark.operators.cql2_text import (
                parse_cql2_text,
            )

            if not isinstance(flt, str):
                raise InvalidQueryError("cql2-text filter must be a string")
            flt = parse_cql2_text(flt)
        elif flt_lang not in (None, "cql2-json"):
            raise InvalidQueryError(f"Unsupported filter-lang {flt_lang!r}")
        items, matched, next_token = execute_search(
            catalog,
            collection_ids=body.get("collections"),
            item_ids=body.get("ids"),
            bbox=bbox,
            intersects=body.get("intersects"),
            datetime_interval=body.get("datetime"),
            cql2_filter=flt,
            query=body.get("query"),
            sortby=body.get("sortby"),
            fields=body.get("fields"),
            limit=limit,
            token=body.get("token"),
        )
        return jsonify(
            _item_collection(
                _serialize_items(items), matched, next_token, request.url
            )
        )

    # ------------------------------------------------------------------
    # Aggregation extension (stac-api-extensions/aggregation — absent
    # from the reference; its users page + count client-side)
    # ------------------------------------------------------------------
    @app.get("/aggregations")
    def aggregations_root() -> Response:
        from stac_fastapi_duckdb_spark.operators.aggregate import (
            list_aggregations,
        )

        return jsonify(list_aggregations())

    @app.get("/collections/<cid>/aggregations")
    def aggregations_collection(cid: str) -> Response:
        from stac_fastapi_duckdb_spark.operators.aggregate import (
            list_aggregations,
        )

        catalog.items_df(cid)  # 404 on unknown collection
        return jsonify(list_aggregations())

    def _run_aggregate(params: dict) -> Response:
        from stac_fastapi_duckdb_spark.operators.aggregate import (
            aggregate_search,
        )

        flt = params.get("filter")
        if isinstance(flt, str):
            from stac_fastapi_duckdb_spark.operators.cql2_text import (
                parse_cql2_text,
            )

            flt = parse_cql2_text(flt)
        return jsonify(
            aggregate_search(
                catalog,
                aggregations=params.get("aggregations"),
                collection_ids=params.get("collections"),
                item_ids=params.get("ids"),
                bbox=params.get("bbox"),
                intersects=params.get("intersects"),
                datetime_interval=params.get("datetime"),
                cql2_filter=flt,
                query=params.get("query"),
                frequency_interval=params.get(
                    "frequency_interval", "month"
                ),
            )
        )

    @app.get("/aggregate")
    def aggregate_get() -> Response:
        return _run_aggregate(
            {
                "aggregations": _parse_csv(request.args.get("aggregations")),
                "collections": _parse_csv(request.args.get("collections")),
                "ids": _parse_csv(request.args.get("ids")),
                "bbox": _parse_bbox(request.args.get("bbox")),
                "intersects": _parse_json_param(
                    request.args.get("intersects"), "intersects"
                ),
                "datetime": request.args.get("datetime"),
                "filter": request.args.get("filter"),
                "query": _parse_json_param(
                    request.args.get("query"), "query"
                ),
                "frequency_interval": request.args.get(
                    "frequency_interval", "month"
                ),
            }
        )

    @app.post("/aggregate")
    def aggregate_post() -> Response:
        body = request.get_json(silent=True)
        if not isinstance(body, dict):
            raise InvalidQueryError("Aggregate body must be a JSON object")
        return _run_aggregate(body)

    # ------------------------------------------------------------------
    # queryables (Filter extension — reference filter_client.py:15-58)
    # ------------------------------------------------------------------
    @app.get("/queryables")
    def global_queryables() -> Response:
        return jsonify(queryables())

    @app.get("/collections/<cid>/queryables")
    def collection_queryables(cid: str) -> Response:
        return jsonify(queryables(catalog, cid))

    return app


def run() -> None:
    """Serve from the environment, mirroring the reference's CLI entry
    (``app.py:94-110`` — uvicorn there, Flask's server here): collection
    registry from ``PARQUET_URLS_JSON`` + ``STAC_FILE_PATH``, bind
    address from ``APP_HOST`` / ``APP_PORT``."""
    import os

    from stac_fastapi_duckdb_spark.session import get_spark

    catalog = CollectionCatalog.from_env(get_spark("stac-api"))
    create_app(catalog).run(
        host=os.environ.get("APP_HOST", "0.0.0.0"),
        port=int(os.environ.get("APP_PORT", "8080")),
    )


if __name__ == "__main__":
    run()

"""Route-level e2e tests for the HTTP API layer — ports of the
reference's API behaviors (/root/reference/tests/api/test_api.py:4-224
and test_sorting_api.py) onto the conftest fixture collections.

The reference drives its FastAPI app through httpx's in-process ASGI
transport; this container has Flask (not FastAPI/httpx), so the same
behaviors run through Flask's in-process test client — identical
routes, payloads, and status-code semantics.

Fixture mapping: the reference's io-lulc-9-class collection → col-a
(20 items; items 0-9 inside bbox (-66,-16,-60,-8), datetimes 2019-2023,
none after 2030, nothing near the ocean bbox (0,0,1,1)).
"""

from __future__ import annotations

import pytest

HIT_BBOX = "-66,-16,-60,-8"
OCEAN_BBOX = "0,0,1,1"
DT_RANGE = "2019-01-01T00:00:00Z/2023-01-01T00:00:00Z"
FUTURE_RANGE = "2030-01-01T00:00:00Z/2031-01-01T00:00:00Z"


@pytest.fixture()
def client(catalog):
    from stac_fastapi_duckdb_spark.api import create_app

    app = create_app(catalog)
    app.config["TESTING"] = True
    return app.test_client()


# ---------------------------------------------------------------------------
# reference tests/api/test_api.py
# ---------------------------------------------------------------------------

def test_get_collections(client):
    resp = client.get("/collections")
    assert resp.status_code == 200
    data = resp.get_json()
    assert "collections" in data and len(data["collections"]) > 0
    assert "col-a" in [c["id"] for c in data["collections"]]


def test_get_collection_items(client):
    resp = client.get("/collections/col-a/items?limit=5")
    assert resp.status_code == 200
    data = resp.get_json()
    assert data["type"] == "FeatureCollection"
    assert len(data["features"]) == 5
    assert data["numMatched"] == 20
    assert data["numReturned"] == 5
    item = data["features"][0]
    assert item["type"] == "Feature"
    assert "id" in item
    assert item["collection"] == "col-a"
    assert "geometry" in item and "properties" in item


def test_bbox_filtering(client):
    resp = client.get(f"/collections/col-a/items?bbox={HIT_BBOX}&limit=3")
    assert resp.status_code == 200
    data = resp.get_json()
    assert data["type"] == "FeatureCollection"
    assert data["numMatched"] == 10  # items 0-9 sit inside the hit bbox
    assert data["numReturned"] == 3


def test_datetime_filtering(client):
    resp = client.get(f"/collections/col-a/items?datetime={DT_RANGE}&limit=3")
    assert resp.status_code == 200
    data = resp.get_json()
    assert data["type"] == "FeatureCollection"
    assert len(data["features"]) == 3
    assert data["numMatched"] > 0


def test_combined_filtering(client):
    resp = client.get(
        f"/collections/col-a/items?bbox={HIT_BBOX}&datetime={DT_RANGE}&limit=2"
    )
    assert resp.status_code == 200
    data = resp.get_json()
    assert data["type"] == "FeatureCollection"
    assert len(data["features"]) == 2


def test_search_endpoint(client):
    resp = client.post(
        "/search",
        json={"collections": ["col-a"], "limit": 3, "datetime": DT_RANGE},
    )
    assert resp.status_code == 200
    data = resp.get_json()
    assert data["type"] == "FeatureCollection"
    assert len(data["features"]) <= 3


def test_real_item_shape(client):
    # reference test_real_item_fixture: a served item is a full STAC Feature
    item = client.get("/collections/col-a/items?limit=1").get_json()["features"][0]
    assert item["type"] == "Feature"
    assert "id" in item and "collection" in item
    assert "geometry" in item and "properties" in item
    assert item["geometry"]["type"] == "Polygon"


def test_bbox_no_results(client):
    resp = client.get(f"/collections/col-a/items?bbox={OCEAN_BBOX}&limit=10")
    assert resp.status_code == 200
    data = resp.get_json()
    assert data["features"] == []
    assert data["numMatched"] == 0
    assert data["numReturned"] == 0


def test_datetime_no_results(client):
    resp = client.get(f"/collections/col-a/items?datetime={FUTURE_RANGE}&limit=10")
    assert resp.status_code == 200
    data = resp.get_json()
    assert data["features"] == []
    assert data["numMatched"] == 0
    assert data["numReturned"] == 0


def test_combined_filters_no_results(client):
    resp = client.get(
        f"/collections/col-a/items?bbox={OCEAN_BBOX}&datetime={FUTURE_RANGE}&limit=10"
    )
    assert resp.status_code == 200
    data = resp.get_json()
    assert data["features"] == []
    assert data["numMatched"] == 0
    assert data["numReturned"] == 0


def test_search_no_results(client):
    resp = client.post(
        "/search",
        json={
            "collections": ["col-a"],
            "limit": 10,
            "bbox": [0, 0, 1, 1],
            "datetime": FUTURE_RANGE,
        },
    )
    assert resp.status_code == 200
    data = resp.get_json()
    assert data["features"] == []
    assert data["numMatched"] == 0
    assert data["numReturned"] == 0


def test_invalid_bbox_format(client):
    resp = client.get("/collections/col-a/items?bbox=-66,-16,-60")
    assert resp.status_code in (400, 422)


def test_invalid_datetime_format(client):
    resp = client.get("/collections/col-a/items?datetime=not-a-date")
    assert resp.status_code in (400, 422)


# ---------------------------------------------------------------------------
# reference tests/api/test_sorting_api.py
# ---------------------------------------------------------------------------

def test_get_sort_by_id_asc_desc(client):
    resp = client.get("/search?limit=5&sortby=+id")
    assert resp.status_code == 200
    ids = [it["id"] for it in resp.get_json()["features"]]
    assert len(ids) > 1 and ids == sorted(ids)

    resp = client.get("/search?limit=5&sortby=-id")
    assert resp.status_code == 200
    ids = [it["id"] for it in resp.get_json()["features"]]
    assert len(ids) > 1 and ids == sorted(ids, reverse=True)


def test_post_sort_by_id_asc_desc(client):
    resp = client.post(
        "/search",
        json={
            "limit": 5,
            "collections": ["col-a"],
            "sortby": [{"field": "id", "direction": "asc"}],
        },
    )
    assert resp.status_code == 200
    ids = [it["id"] for it in resp.get_json()["features"]]
    assert len(ids) > 1 and ids == sorted(ids)

    resp = client.post(
        "/search",
        json={
            "limit": 5,
            "collections": ["col-a"],
            "sortby": [{"field": "id", "direction": "desc"}],
        },
    )
    assert resp.status_code == 200
    ids = [it["id"] for it in resp.get_json()["features"]]
    assert len(ids) > 1 and ids == sorted(ids, reverse=True)


# ---------------------------------------------------------------------------
# beyond the reference suite: routes its tests never reach
# ---------------------------------------------------------------------------

def test_landing_and_conformance(client):
    landing = client.get("/").get_json()
    assert landing["type"] == "Catalog"
    rels = {l["rel"] for l in landing["links"]}
    assert {"self", "conformance", "data", "search"} <= rels
    conf = client.get("/conformance").get_json()["conformsTo"]
    assert any(c.endswith("/item-search") for c in conf)
    assert any("advanced-comparison-operators" in c for c in conf)


def test_get_one_collection_and_404(client):
    assert client.get("/collections/col-a").get_json()["id"] == "col-a"
    assert client.get("/collections/nope").status_code == 404


def test_get_one_item_and_404s(client):
    item = client.get("/collections/col-a/items/item-a-003").get_json()
    assert item["id"] == "item-a-003" and item["type"] == "Feature"
    assert client.get("/collections/col-a/items/missing").status_code == 404
    assert client.get("/collections/nope/items/item-a-003").status_code == 404
    assert client.get("/collections/nope/items").status_code == 404


def test_pagination_next_token_roundtrip(client):
    p1 = client.get("/collections/col-a/items?limit=15").get_json()
    next_link = [l for l in p1["links"] if l["rel"] == "next"]
    assert len(next_link) == 1
    tok = next_link[0]["token"]
    p2 = client.get(f"/collections/col-a/items?limit=15&token={tok}").get_json()
    assert p2["numReturned"] == 5  # 20 rows: 15 + 5
    assert not [l for l in p2["links"] if l["rel"] == "next"]
    ids = [f["id"] for f in p1["features"] + p2["features"]]
    assert len(set(ids)) == 20


def test_search_cql2_filter_post(client):
    flt = {
        "op": "and",
        "args": [
            {"op": "=", "args": [{"property": "platform"}, "sentinel-2"]},
            {"op": ">=", "args": [{"property": "gsd"}, 14]},
        ],
    }
    data = client.post(
        "/search", json={"collections": ["col-b"], "filter": flt, "limit": 100}
    ).get_json()
    assert data["numMatched"] == 4  # gsd 14..17
    props = data["features"][0]["properties"]
    assert props["platform"] == "sentinel-2"


def test_search_cql2_text_get(client):
    """GET filter in the Filter extension's default TEXT encoding —
    equivalent to test_search_cql2_filter_post's JSON filter."""
    data = client.get(
        "/search?collections=col-b&limit=100"
        "&filter-lang=cql2-text"
        "&filter=platform = 'sentinel-2' AND gsd >= 14"
    ).get_json()
    assert data["numMatched"] == 4
    assert data["features"][0]["properties"]["platform"] == "sentinel-2"


def test_search_cql2_text_get_default_lang(client):
    """No filter-lang: a non-JSON filter value parses as cql2-text
    (the GET default), a JSON object still parses as cql2-json."""
    text = client.get(
        "/search?collections=col-b&limit=100&filter=gsd >= 14"
    ).get_json()
    json_form = client.get(
        "/search?collections=col-b&limit=100"
        '&filter={"op": ">=", "args": [{"property": "gsd"}, 14]}'
    ).get_json()
    assert text["numMatched"] == json_form["numMatched"] == 4


def test_search_cql2_text_post(client):
    data = client.post(
        "/search",
        json={
            "collections": ["col-b"],
            "filter": "platform = 'sentinel-2' AND gsd >= 14",
            "filter-lang": "cql2-text",
            "limit": 100,
        },
    ).get_json()
    assert data["numMatched"] == 4


def test_search_cql2_text_bad_input(client):
    assert (
        client.get(
            "/search?filter-lang=cql2-text&filter=platform ~ 3"
        ).status_code
        in (400, 422)
    )
    assert (
        client.get("/search?filter-lang=cql2-xml&filter=x = 1").status_code
        in (400, 422)
    )
    assert (
        client.post(
            "/search", json={"filter-lang": "cql2-text", "filter": {"op": "="}}
        ).status_code
        in (400, 422)
    )


def test_search_fields_projection(client):
    data = client.get(
        "/search?collections=col-a&fields=platform&limit=2"
    ).get_json()
    props = data["features"][0]["properties"]
    assert "platform" in props
    assert "cloud_cover" not in props  # pruned at the parquet reader


def test_queryables_routes(client):
    q = client.get("/queryables").get_json()
    assert q["type"] == "object" and "datetime" in q["properties"]
    qa = client.get("/collections/col-a/queryables").get_json()
    # schema-enriched: parquet-only columns become advertised queryables
    assert "cloud_cover" in qa["properties"]
    assert qa["properties"]["cloud_cover"]["type"] == "number"


def test_post_search_invalid_body(client):
    assert client.post("/search", json=[1, 2, 3]).status_code in (400, 422)
    assert (
        client.post("/search", json={"limit": "ten"}).status_code in (400, 422)
    )
    assert (
        client.post("/search", json={"bbox": "0,0,1,1"}).status_code in (400, 422)
    )


# ---------------------------------------------------------------------------
# Aggregation extension (beyond-reference; stac-api-extensions/aggregation)
# ---------------------------------------------------------------------------


def test_aggregations_discovery(client):
    resp = client.get("/aggregations")
    assert resp.status_code == 200
    names = {a["name"] for a in resp.get_json()["aggregations"]}
    assert {"total_count", "datetime_frequency", "collection_frequency"} <= names
    assert client.get("/collections/col-a/aggregations").status_code == 200
    assert client.get("/collections/nope/aggregations").status_code == 404


def test_aggregate_default_set(client):
    resp = client.get("/aggregate?collections=col-a")
    assert resp.status_code == 200
    aggs = {a["name"]: a for a in resp.get_json()["aggregations"]}
    assert aggs["total_count"]["value"] == 20
    assert aggs["datetime_min"]["value"] <= aggs["datetime_max"]["value"]
    cf = aggs["collection_frequency"]["buckets"]
    assert cf == [{"key": "col-a", "frequency": 20}]
    df_buckets = aggs["datetime_frequency"]["buckets"]
    assert sum(b["frequency"] for b in df_buckets) == 20


def test_aggregate_respects_search_filters(client):
    resp = client.get(
        f"/aggregate?collections=col-a&bbox={HIT_BBOX}"
        "&aggregations=total_count"
    )
    assert resp.status_code == 200
    aggs = resp.get_json()["aggregations"]
    assert aggs == [
        {"name": "total_count", "data_type": "integer", "value": 10}
    ]


def test_aggregate_post_terms_frequency(client):
    resp = client.post(
        "/aggregate",
        json={
            "collections": ["col-a"],
            "aggregations": ["id_frequency", "total_count"],
        },
    )
    assert resp.status_code == 200
    aggs = {a["name"]: a for a in resp.get_json()["aggregations"]}
    assert aggs["total_count"]["value"] == 20
    assert len(aggs["id_frequency"]["buckets"]) == 20
    assert all(b["frequency"] == 1 for b in aggs["id_frequency"]["buckets"])


def test_aggregate_unknown_aggregation_400(client):
    resp = client.get("/aggregate?aggregations=bogus_metric")
    assert resp.status_code == 400
    resp = client.get("/aggregate?aggregations=nosuchfield_frequency")
    assert resp.status_code == 400
    resp = client.post("/aggregate", json={"frequency_interval": "decade"})
    assert resp.status_code == 400


def test_aggregate_with_cql2_text_filter(client):
    resp = client.get(
        "/aggregate?collections=col-a&aggregations=total_count"
        "&filter=id = 'item-a-003'"
    )
    assert resp.status_code == 200
    assert resp.get_json()["aggregations"][0]["value"] == 1


def test_aggregate_get_supports_intersects_and_query(client):
    """GET /aggregate must honor intersects + query like POST does
    (previously they were silently dropped on GET)."""
    import json

    poly = json.dumps(
        {
            "type": "Polygon",
            "coordinates": [
                [[-66, -16], [-59, -16], [-59, -7], [-66, -7], [-66, -16]]
            ],
        }
    )
    resp = client.get(
        "/aggregate?collections=col-a&aggregations=total_count"
        f"&intersects={poly}"
    )
    assert resp.status_code == 200
    assert resp.get_json()["aggregations"][0]["value"] == 10

    q = json.dumps({"platform": {"eq": "landsat-8"}})
    resp = client.get(
        f"/aggregate?collections=col-a&aggregations=total_count&query={q}"
    )
    assert resp.status_code == 200
    constrained = resp.get_json()["aggregations"][0]["value"]
    assert 0 < constrained < 20  # actually constrained, not the full set


def test_aggregate_overflow_flag(catalog):
    """Terms aggregation with more distinct values than max_buckets
    must report overflow=True (previously hardcoded False)."""
    from stac_fastapi_duckdb_spark.operators.aggregate import (
        aggregate_search,
    )

    res = aggregate_search(
        catalog,
        aggregations=["id_frequency"],
        collection_ids=["col-a"],
        max_buckets=5,
    )["aggregations"][0]
    assert res["overflow"] is True
    assert len(res["buckets"]) == 5

    res = aggregate_search(
        catalog,
        aggregations=["id_frequency"],
        collection_ids=["col-a"],
        max_buckets=100,
    )["aggregations"][0]
    assert res["overflow"] is False
    assert len(res["buckets"]) == 20


def test_aggregate_scalar_datetime_validated_fail_closed(
    spark, tmp_path_factory
):
    """datetime_min/max on a collection with no datetime column must
    400 (InvalidQueryError), not explode mid-job with a 500."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from stac_fastapi_duckdb_spark.api import create_app
    from stac_fastapi_duckdb_spark.sources.catalog import CollectionCatalog

    base = tmp_path_factory.mktemp("nodt")
    tbl = pa.table({"id": ["x-1", "x-2"], "value": [1.0, 2.0]})
    pq.write_table(tbl, str(base / "col-x.parquet"))
    cat = CollectionCatalog(spark, {"col-x": str(base / "col-x.parquet")}, None)
    app = create_app(cat)
    app.config["TESTING"] = True
    c = app.test_client()
    for agg in ("datetime_min", "datetime_max", "datetime_frequency"):
        resp = c.get(f"/aggregate?collections=col-x&aggregations={agg}")
        assert resp.status_code == 400, agg
    # total_count still works on the datetime-less collection
    resp = c.get("/aggregate?collections=col-x&aggregations=total_count")
    assert resp.status_code == 200
    assert resp.get_json()["aggregations"][0]["value"] == 2

"""CQL2-JSON compiler tests (reference database_logic.py:539-659,
filter_client.py:64-81)."""

import pytest

from stac_fastapi_duckdb_spark.errors import InvalidQueryError
from stac_fastapi_duckdb_spark.operators.cql2 import cql2_to_column, supported_cql2_ops


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        ("a", "landsat-8", 10.0),
        ("b", "landsat-9", 40.0),
        ("c", "sentinel-2", 80.0),
        ("d", None, None),
    ]
    return spark.createDataFrame(rows, "id string, platform string, cloud_cover double")


def _ids(df, expr):
    return sorted(r.id for r in df.filter(cql2_to_column(expr, df.columns)).collect())


def prop(name):
    return {"property": name}


def test_eq(df):
    assert _ids(df, {"op": "=", "args": [prop("platform"), "landsat-8"]}) == ["a"]


def test_neq_is_real(df):
    # advertised-but-not-compiled in the reference (C12) — real here
    assert _ids(df, {"op": "<>", "args": [prop("platform"), "landsat-8"]}) == ["b", "c"]
    assert _ids(df, {"op": "neq", "args": [prop("platform"), "landsat-8"]}) == ["b", "c"]


def test_comparisons(df):
    assert _ids(df, {"op": "<", "args": [prop("cloud_cover"), 40]}) == ["a"]
    assert _ids(df, {"op": "<=", "args": [prop("cloud_cover"), 40]}) == ["a", "b"]
    assert _ids(df, {"op": ">", "args": [prop("cloud_cover"), 40]}) == ["c"]
    assert _ids(df, {"op": ">=", "args": [prop("cloud_cover"), 40]}) == ["b", "c"]


def test_and_or_not(df):
    expr = {
        "op": "and",
        "args": [
            {"op": ">", "args": [prop("cloud_cover"), 5]},
            {"op": "like", "args": [prop("platform"), "landsat%"]},
        ],
    }
    assert _ids(df, expr) == ["a", "b"]
    expr_or = {
        "op": "or",
        "args": [
            {"op": "=", "args": [prop("platform"), "sentinel-2"]},
            {"op": "<", "args": [prop("cloud_cover"), 20]},
        ],
    }
    assert _ids(df, expr_or) == ["a", "c"]
    expr_not = {"op": "not", "args": [{"op": "like", "args": [prop("platform"), "landsat%"]}]}
    assert _ids(df, expr_not) == ["c"]


def test_like_and_ilike(df):
    assert _ids(df, {"op": "like", "args": [prop("platform"), "landsat%"]}) == ["a", "b"]
    # ilike advertised-but-missing in the reference — real here
    assert _ids(df, {"op": "ilike", "args": [prop("platform"), "LANDSAT%"]}) == ["a", "b"]


def test_in(df):
    expr = {"op": "in", "args": [prop("platform"), ["landsat-8", "sentinel-2"]]}
    assert _ids(df, expr) == ["a", "c"]


def test_between(df):
    assert _ids(df, {"op": "between", "args": [prop("cloud_cover"), 20, 90]}) == ["b", "c"]
    # 2-arg list form also accepted
    assert _ids(df, {"op": "between", "args": [prop("cloud_cover"), [20, 90]]}) == ["b", "c"]


def test_is_null(df):
    assert _ids(df, {"op": "isNull", "args": [prop("platform")]}) == ["d"]


def test_unsupported_op_fails_closed(df):
    # reference emits 1=1 (database_logic.py:622-624); we raise
    with pytest.raises(InvalidQueryError):
        cql2_to_column({"op": "s_intersects_3d", "args": []}, df.columns)


def test_unknown_property_fails_closed(df):
    with pytest.raises(InvalidQueryError):
        cql2_to_column({"op": "=", "args": [prop("nope"), 1]}, df.columns)


def test_property_variant_resolution(spark):
    df = spark.createDataFrame([("x", 5.0)], "id string, `properties.score` double")
    ids = [
        r.id
        for r in df.filter(
            cql2_to_column({"op": ">", "args": [prop("score"), 1]}, df.columns)
        ).collect()
    ]
    assert ids == ["x"]


def test_supported_ops_superset_of_reference():
    ops = supported_cql2_ops()
    # everything the reference advertises (filter_client.py:64-81)
    for op in ("and", "or", "not", "=", "<>", "<", "<=", ">", ">=", "like", "in",
               "between", "isNull", "neq", "ilike"):
        assert op in ops

"""CQL2-text parser: unit cases + AST↔text round-trip property test.

The text encoding must compile through the SAME dict AST as the JSON
path (operators/cql2.py), so equivalence is tested at the AST level
and, for a sample, at the filtered-row level against the JSON form.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from stac_fastapi_duckdb_spark.errors import InvalidQueryError
from stac_fastapi_duckdb_spark.operators.cql2 import cql2_to_column
from stac_fastapi_duckdb_spark.operators.cql2_text import (
    parse_cql2_text,
    render_cql2_text,
)


# ---------------------------------------------------------------------------
# unit cases
# ---------------------------------------------------------------------------
CASES = [
    (
        "cloud_cover < 10",
        {"op": "<", "args": [{"property": "cloud_cover"}, 10]},
    ),
    (
        "platform = 'landsat-8'",
        {"op": "=", "args": [{"property": "platform"}, "landsat-8"]},
    ),
    (
        "name LIKE 'S2%'",
        {"op": "like", "args": [{"property": "name"}, "S2%"]},
    ),
    (
        "name NOT ILIKE 's2%'",
        {
            "op": "not",
            "args": [{"op": "ilike", "args": [{"property": "name"}, "s2%"]}],
        },
    ),
    (
        "cloud_cover BETWEEN 0 AND 25.5",
        {"op": "between", "args": [{"property": "cloud_cover"}, 0, 25.5]},
    ),
    (
        "platform IN ('a', 'b', 'c')",
        {"op": "in", "args": [{"property": "platform"}, ["a", "b", "c"]]},
    ),
    (
        "gsd IS NULL",
        {"op": "isNull", "args": [{"property": "gsd"}]},
    ),
    (
        "gsd IS NOT NULL",
        {"op": "not", "args": [{"op": "isNull", "args": [{"property": "gsd"}]}]},
    ),
    (
        "a = 1 AND b = 2 OR c = 3",
        {
            "op": "or",
            "args": [
                {
                    "op": "and",
                    "args": [
                        {"op": "=", "args": [{"property": "a"}, 1]},
                        {"op": "=", "args": [{"property": "b"}, 2]},
                    ],
                },
                {"op": "=", "args": [{"property": "c"}, 3]},
            ],
        },
    ),
    (
        "a = 1 AND (b = 2 OR c = 3)",
        {
            "op": "and",
            "args": [
                {"op": "=", "args": [{"property": "a"}, 1]},
                {
                    "op": "or",
                    "args": [
                        {"op": "=", "args": [{"property": "b"}, 2]},
                        {"op": "=", "args": [{"property": "c"}, 3]},
                    ],
                },
            ],
        },
    ),
    (
        "NOT a <> 1",
        {"op": "not", "args": [{"op": "<>", "args": [{"property": "a"}, 1]}]},
    ),
    (
        "datetime >= TIMESTAMP('2020-01-01T00:00:00Z')",
        {
            "op": ">=",
            "args": [
                {"property": "datetime"},
                {"timestamp": "2020-01-01T00:00:00Z"},
            ],
        },
    ),
    (
        "\"proj:epsg\" = 32633",
        {"op": "=", "args": [{"property": "proj:epsg"}, 32633]},
    ),
    (
        "note = 'it''s fine'",
        {"op": "=", "args": [{"property": "note"}, "it's fine"]},
    ),
    (
        "ok = TRUE AND bad = FALSE",
        {
            "op": "and",
            "args": [
                {"op": "=", "args": [{"property": "ok"}, True]},
                {"op": "=", "args": [{"property": "bad"}, False]},
            ],
        },
    ),
    (
        "v BETWEEN -5 AND -1",
        {"op": "between", "args": [{"property": "v"}, -5, -1]},
    ),
]


@pytest.mark.parametrize("text,expected", CASES, ids=[c[0][:40] for c in CASES])
def test_parse_cases(text, expected):
    assert parse_cql2_text(text) == expected


def test_keywords_case_insensitive():
    assert parse_cql2_text("a like 'x%' and b is null") == {
        "op": "and",
        "args": [
            {"op": "like", "args": [{"property": "a"}, "x%"]},
            {"op": "isNull", "args": [{"property": "b"}]},
        ],
    }


@pytest.mark.parametrize(
    "bad",
    [
        "",
        "   ",
        "a =",
        "a = 1 AND",
        "a BETWEEN 1",
        "a IN (1,",
        "a IN ()",
        "LIKE 'x'",
        "a = 1 extra_token",
        "a ~ 1",
        "a = 'unterminated",
        "(a = 1",
        "a NOT = 1",
    ],
)
def test_malformed_fail_closed(bad):
    with pytest.raises(InvalidQueryError):
        parse_cql2_text(bad)


def test_parsed_ast_compiles(spark):
    """Every unit case's AST must be accepted by the JSON compiler."""
    for text, _ in CASES:
        cql2_to_column(parse_cql2_text(text))


# ---------------------------------------------------------------------------
# round-trip property test: random AST → text → parse == AST
# ---------------------------------------------------------------------------
_props = st.sampled_from(["alpha", "beta_2", "proj:epsg", "properties.datetime"])
_lits = st.one_of(
    st.integers(-1000, 1000),
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ).map(lambda f: round(f, 3)),
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters=" '%_-"
        ),
        max_size=12,
    ),
    st.booleans(),
)


def _leaf() -> st.SearchStrategy:
    prop = _props.map(lambda p: {"property": p})
    cmp_ops = st.sampled_from(["=", "<>", "<", "<=", ">", ">="])
    comparison = st.tuples(cmp_ops, prop, _lits).map(
        lambda t: {"op": t[0], "args": [t[1], t[2]]}
    )
    like = st.tuples(prop, st.sampled_from(["S2%", "%x_", "a''b%"])).map(
        lambda t: {"op": "like", "args": [t[0], t[1].replace("''", "'")]}
    )
    between = st.tuples(prop, st.integers(-50, 0), st.integers(1, 50)).map(
        lambda t: {"op": "between", "args": [t[0], t[1], t[2]]}
    )
    inlist = st.tuples(prop, st.lists(_lits, min_size=1, max_size=4)).map(
        lambda t: {"op": "in", "args": [t[0], t[1]]}
    )
    isnull = prop.map(lambda p: {"op": "isNull", "args": [p]})
    return st.one_of(comparison, like, between, inlist, isnull)


_ast = st.recursive(
    _leaf(),
    lambda children: st.one_of(
        st.tuples(
            st.sampled_from(["and", "or"]), st.lists(children, min_size=2, max_size=3)
        ).map(
            lambda t: {"op": t[0], "args": t[1]}
        ),
        children.map(lambda c: {"op": "not", "args": [c]}),
    ),
    max_leaves=8,
)


@settings(max_examples=200, deadline=None)
@given(_ast)
def test_roundtrip(ast):
    assert parse_cql2_text(render_cql2_text(ast)) == ast


# ---------------------------------------------------------------------------
# row-level equivalence: text form filters exactly like the JSON form
# ---------------------------------------------------------------------------
def test_text_and_json_filter_same_rows(spark):
    df = spark.createDataFrame(
        [(i, float(i % 7), f"name{i % 5}", None if i % 3 == 0 else i) for i in range(50)],
        ["id", "score", "name", "maybe"],
    )
    text = "(score < 3.0 OR name LIKE 'name1%') AND maybe IS NOT NULL"
    ast = parse_cql2_text(text)
    got = sorted(r.id for r in df.filter(cql2_to_column(ast)).collect())
    want = sorted(
        r.id
        for r in df.collect()
        if (r.score < 3.0 or r.name.startswith("name1")) and r.maybe is not None
    )
    assert got == want

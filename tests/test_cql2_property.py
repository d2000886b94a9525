"""Property-based differential test: random CQL2 filter trees compiled
by cql2_to_column must agree row-for-row with DuckDB evaluating the
equivalent SQL on the same data.

This is the fuzzing layer the reference entirely lacks (its compiler
fail-opens to 1=1 on anything unexpected, SURVEY §4.4); here every
generated tree must either compile on BOTH engines or raise on ours.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stac_fastapi_duckdb_spark.operators.cql2 import cql2_to_column

ROWS = [
    (i, f"s{i % 7}", float(i) * 1.5 - 30.0, i % 5, None if i % 11 == 0 else f"t{i % 3}")
    for i in range(200)
]
COLUMNS = ["id", "name", "score", "grade", "tag"]

NUM_PROPS = ["id", "score", "grade"]
STR_PROPS = ["name", "tag"]


def _prop(p):
    return {"property": p}


num_literals = st.one_of(
    st.integers(min_value=-50, max_value=250),
    st.floats(min_value=-50, max_value=250, allow_nan=False, width=32).map(
        lambda f: round(f, 3)
    ),
)
str_literals = st.sampled_from(["s0", "s3", "t1", "t2", "zzz", ""])

comparison = st.one_of(
    st.tuples(
        st.sampled_from(["=", "<>", "<", "<=", ">", ">="]),
        st.sampled_from(NUM_PROPS),
        num_literals,
    ).map(lambda t: {"op": t[0], "args": [_prop(t[1]), t[2]]}),
    st.tuples(
        st.sampled_from(["=", "<>", "like", "ilike"]),
        st.sampled_from(STR_PROPS),
        str_literals,
    ).map(lambda t: {"op": t[0], "args": [_prop(t[1]), t[2]]}),
    st.tuples(st.sampled_from(NUM_PROPS), num_literals, num_literals).map(
        lambda t: {"op": "between", "args": [_prop(t[0]), min(t[1], t[2]), max(t[1], t[2])]}
    ),
    st.tuples(
        st.sampled_from(STR_PROPS), st.lists(str_literals, min_size=1, max_size=4)
    ).map(lambda t: {"op": "in", "args": [_prop(t[0]), t[1]]}),
    st.sampled_from(STR_PROPS + NUM_PROPS).map(
        lambda p: {"op": "isNull", "args": [_prop(p)]}
    ),
)


def _tree(children):
    return st.one_of(
        st.tuples(st.sampled_from(["and", "or"]), st.lists(children, min_size=2, max_size=3)).map(
            lambda t: {"op": t[0], "args": t[1]}
        ),
        children.map(lambda c: {"op": "not", "args": [c]}),
    )


cql2_trees = st.recursive(comparison, _tree, max_leaves=6)


def _to_sql(expr) -> str:
    op = expr["op"]
    args = expr["args"]
    if op in ("and", "or"):
        return "(" + f" {op.upper()} ".join(_to_sql(a) for a in args) + ")"
    if op == "not":
        return f"(NOT {_to_sql(args[0])})"
    if op == "isNull":
        return f'("{args[0]["property"]}" IS NULL)'
    if op == "between":
        return f'("{args[0]["property"]}" BETWEEN {_lit(args[1])} AND {_lit(args[2])})'
    if op == "in":
        vals = ", ".join(_lit(v) for v in args[1])
        return f'("{args[0]["property"]}" IN ({vals}))'
    if op == "like":
        return f'("{args[0]["property"]}" LIKE {_lit(args[1])})'
    if op == "ilike":
        return f'(lower("{args[0]["property"]}") LIKE lower({_lit(args[1])}))'
    return f'("{args[0]["property"]}" {op} {_lit(args[1])})'


def _lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


@pytest.fixture(scope="module")
def data(spark):
    sdf = spark.createDataFrame(
        ROWS, "id int, name string, score double, grade int, tag string"
    )
    sdf.cache().count()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (id INTEGER, name VARCHAR, score DOUBLE, grade INTEGER, tag VARCHAR)"
    )
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", ROWS)
    return sdf, con


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(expr=cql2_trees)
def test_cql2_differential(data, expr):
    sdf, con = data
    got = sorted(
        r.id for r in sdf.filter(cql2_to_column(expr, COLUMNS)).select("id").collect()
    )
    want = sorted(
        r[0] for r in con.execute(f"SELECT id FROM t WHERE {_to_sql(expr)}").fetchall()
    )
    assert got == want, f"divergence on {expr}"

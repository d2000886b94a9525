"""STAC-QL query extension: {field: {op: value}} → Column (P12).

The reference REGISTERS the Query extension (app.py:35) but its backend
``apply_stacql_filter`` is a pass-stub (database_logic.py:450-486) —
queries using it silently match everything. Implemented for real here
(SURVEY §2.2 P12 calls it "trivial to actually implement").

Grammar (STAC API Query extension): ``{"cloud_cover": {"lt": 10},
"platform": {"eq": "landsat-8"}}``; multiple fields AND together;
shorthand ``{"platform": "landsat-8"}`` means eq.
"""

from __future__ import annotations

from functools import reduce
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.errors import InvalidQueryError
from stac_fastapi_duckdb_spark.operators.cql2 import resolve_property, safe_col

_OPS = {
    "eq": lambda c, v: c == v,
    "neq": lambda c, v: c != v,
    "lt": lambda c, v: c < v,
    "lte": lambda c, v: c <= v,
    "gt": lambda c, v: c > v,
    "gte": lambda c, v: c >= v,
    "startsWith": lambda c, v: c.startswith(v),
    "endsWith": lambda c, v: c.endswith(v),
    "contains": lambda c, v: c.contains(v),
    "in": lambda c, v: c.isin(v),
}


def stacql_to_column(query: dict[str, Any], columns: list[str] | None = None) -> Column:
    """Compile a Query-extension dict into one boolean Column."""
    if not isinstance(query, dict) or not query:
        raise InvalidQueryError("query must be a non-empty object")
    preds: list[Column] = []
    for field, spec in query.items():
        col = safe_col(resolve_property(field, columns))
        if not isinstance(spec, dict):
            preds.append(col == spec)
            continue
        for op, value in spec.items():
            fn = _OPS.get(op)
            if fn is None:
                raise InvalidQueryError(f"Unsupported query op {op!r}")
            preds.append(fn(col, value))
    return reduce(lambda a, b: a & b, preds)

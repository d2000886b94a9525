"""Temporal predicates with STAC NULL-interval semantics (P5–P9).

Reference semantics (/root/reference/stac_fastapi/duckdb/database_logic.py):

- exact instant (``:261-273``): matches when the instant field equals X,
  OR the instant field is NULL and the item's validity interval
  [start_datetime, end_datetime] contains X.
- closed range gte..lte (``:279-292``): instant in [gte, lte] OR
  interval overlap (start <= lte AND end >= gte).
- open-ended gte (``:293-302``): datetime >= gte OR
  (datetime IS NULL AND end_datetime >= gte).
- open-ended lte (``:303-312``): datetime <= lte OR
  (datetime IS NULL AND start_datetime <= lte).
- interval string parser (``:317-347``): "a/b" → gte/lte, ".." → open
  side, no "/" → exact.

The reference interpolates ISO strings into SQL and relies on DuckDB's
implicit cast; here intervals are parsed Python-side and compared as
TimestampType literals (tz pinned to UTC in session.py), so the
predicate is a plain Column tree that Catalyst pushes into the parquet
scan (min/max row-group skipping applies — at 100 TB with time-ordered
ingest this is the primary pruning axis).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Column
from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.errors import InvalidQueryError

DEFAULT_FIELDS = ("datetime", "start_datetime", "end_datetime")


def _parse_rfc3339(value: str) -> datetime:
    """Parse one RFC-3339 instant; 'Z' suffix normalized. Invalid input
    fails closed (reference silently ignores; SURVEY §4.4)."""
    v = value.strip()
    if v.endswith(("Z", "z")):
        v = v[:-1] + "+00:00"
    try:
        dt = datetime.fromisoformat(v)
    except ValueError as e:
        raise InvalidQueryError(f"Invalid datetime {value!r}") from e
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc).replace(tzinfo=None)  # naive-UTC for Spark


def parse_datetime_interval(value: str) -> dict[str, datetime]:
    """``"a/b"`` → {gte, lte}; ``".."`` → open side; no ``/`` → {eq}.

    Port of the interval grammar at ``database_logic.py:317-347``,
    returning parsed datetimes instead of raw strings.
    """
    if not value:
        raise InvalidQueryError("Empty datetime")
    if "/" not in value:
        return {"eq": _parse_rfc3339(value)}
    lo, _, hi = value.partition("/")
    out: dict[str, datetime] = {}
    if lo not in ("..", ""):
        out["gte"] = _parse_rfc3339(lo)
    if hi not in ("..", ""):
        out["lte"] = _parse_rfc3339(hi)
    if not out:
        raise InvalidQueryError(f"Unbounded interval {value!r}")
    if "gte" in out and "lte" in out and out["gte"] > out["lte"]:
        raise InvalidQueryError(f"Interval start after end: {value!r}")
    return out


def datetime_predicate(
    interval: str | dict[str, datetime],
    fields: tuple[str, str, str] = DEFAULT_FIELDS,
) -> Column:
    """Compile a STAC datetime search into one boolean Column (P5–P8)."""
    spec = parse_datetime_interval(interval) if isinstance(interval, str) else interval
    dt, sdt, edt = (F.col(f) for f in fields)

    if "eq" in spec:
        x = F.lit(spec["eq"])
        # database_logic.py:261-273
        return (dt.isNotNull() & (dt == x)) | (
            dt.isNull()
            & sdt.isNotNull()
            & edt.isNotNull()
            & (sdt <= x)
            & (edt >= x)
        )

    gte = F.lit(spec["gte"]) if "gte" in spec else None
    lte = F.lit(spec["lte"]) if "lte" in spec else None

    if gte is not None and lte is not None:
        # database_logic.py:279-292
        instant = dt.isNotNull() & (dt >= gte) & (dt <= lte)
        interval_overlap = (
            dt.isNull()
            & sdt.isNotNull()
            & edt.isNotNull()
            & (sdt <= lte)
            & (edt >= gte)
        )
        return instant | interval_overlap
    if gte is not None:
        # database_logic.py:293-302
        return (dt.isNotNull() & (dt >= gte)) | (
            dt.isNull() & edt.isNotNull() & (edt >= gte)
        )
    # database_logic.py:303-312
    return (dt.isNotNull() & (dt <= lte)) | (
        dt.isNull() & sdt.isNotNull() & (sdt <= lte)
    )

"""Driver-computed results as true LocalRelations.

``spark.createDataFrame(rows, schema)`` plans ``Scan ExistingRDD``: the
rows are parallelized into ``defaultParallelism`` slices and every
materialization (collect, sink write) schedules that many tasks —
~0.2-0.3 s on local[32] for a 10-row serving answer, pure scheduling
overhead. A SQL ``VALUES`` relation instead plans ``LocalTableScan``
(no RDD, rows live in the plan), and the same materialization costs one
task (~0.07 s measured). Every driver-side serving path (hybrid probe,
MMR/k-center greedy) returns a handful of numeric rows, so the floor is
the whole query cost there.

Numeric columns and quote-safe strings only: integer literals are
exact, ``repr(float)`` is the shortest IEEE-754 round-trip decimal,
which the JVM's ``Double.parseDouble`` re-reads to the identical bits,
and strings are admitted only from a conservative charset with no
quote/backslash/control characters — the literals round-trip exactly,
preserving the driver/distributed path equivalence contracts.
Anything else falls back to ``createDataFrame`` unchanged.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructType,
)

_INT_TYPES = (IntegerType, LongType)

# strings admitted as inline literals: a conservative charset with no
# quote/backslash/control characters, so the emitted literal can never
# escape its quoting regardless of parser mode. Anything else falls
# back to createDataFrame (identical results, just the RDD path).
_SAFE_STR = re.compile(r"^[A-Za-z0-9_\-\. :/@#+,%()=\[\]]{0,256}$")


def _lit(value, dtype) -> str | None:
    """Exact SQL literal for one cell; None when the type is
    unsupported (caller falls back to createDataFrame)."""
    if isinstance(dtype, _INT_TYPES):
        sql_t = "BIGINT" if isinstance(dtype, LongType) else "INT"
        if value is None:
            return f"CAST(NULL AS {sql_t})"
        if isinstance(value, bool) or not isinstance(value, int):
            return None
        # range-check before emitting the CAST: with ANSI off an
        # out-of-range literal would silently wrap where the
        # createDataFrame path raises — fall back so both paths are
        # behavior-identical on bad input
        bits = 64 if isinstance(dtype, LongType) else 32
        if not -(1 << (bits - 1)) <= value < (1 << (bits - 1)):
            return None
        return f"CAST({int(value)} AS {sql_t})"
    if isinstance(dtype, DoubleType):
        if value is None:
            return "CAST(NULL AS DOUBLE)"
        if not isinstance(value, (int, float)) or isinstance(value, bool):
            return None
        v = float(value)
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(v):
            return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
        if v == 0.0 and math.copysign(1.0, v) < 0:
            # the SQL parser reads -0.0 as a DECIMAL (sign-less) —
            # only the string cast preserves the negative zero
            return "CAST('-0.0' AS DOUBLE)"
        return f"CAST({v!r} AS DOUBLE)"
    if isinstance(dtype, StringType):
        if value is None:
            return "CAST(NULL AS STRING)"
        if not isinstance(value, str) or not _SAFE_STR.match(value):
            return None
        return f"'{value}'"
    return None


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Build a DataFrame from driver-resident rows as a LocalRelation
    (``VALUES`` → LocalTableScan) when the schema is all-numeric and
    rows are non-empty; otherwise fall back to
    ``spark.createDataFrame`` (identical results either way — the
    literals round-trip bit-exactly, see module docstring).

    ``schema`` is a StructType or a DDL string."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if not rows or len(rows) > 1024:
        # a serving answer is tens of rows; past ~1k the VALUES SQL
        # string itself becomes the cost (parse + analyze scale with
        # literal count) and the RDD path's task overhead amortizes
        return spark.createDataFrame(rows, schema)
    value_rows = []
    for row in rows:
        lits = []
        for value, field in zip(row, schema.fields):
            lit = _lit(value, field.dataType)
            if lit is None:
                return spark.createDataFrame(rows, schema)
            lits.append(lit)
        value_rows.append(f"({', '.join(lits)})")
    cols = ", ".join(
        f"col{i + 1} AS `{f.name}`" for i, f in enumerate(schema.fields)
    )
    return spark.sql(f"SELECT {cols} FROM VALUES {', '.join(value_rows)}")

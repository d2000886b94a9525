"""As-of (most-recent-match) join — an operator Spark has no native
form of.

Semantics (direction="backward", DuckDB/pandas-compatible): for each
left row, attach the right row with the same key and the greatest
right_time ≤ left_time; left rows with no qualifying match keep NULLs.

Implementation is the distributed union+window trick, NOT a per-key
``merge_asof`` UDF:

1. union right rows (payload struct) and left rows (payload NULL, own
   columns in a struct) on (key, time, side),
2. within each key, sort by (time, right-before-left tie order); a
   running ``last(payload, ignorenulls=True)`` hands every left row the
   latest right payload at-or-before its timestamp,
3. keep the left rows, unpack both structs.

Cost: ONE shuffle of |left|+|right| rows on the key — the same price as
an equi-join; no range explosion, no Python, no non-deterministic row
ids. Skew in the key column is the usual caveat (salt or AQE). The
running-last window is a single ordered scan with constant state per
partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_payload: list[str] | None = None,
    suffix: str = "",
) -> DataFrame:
    """Backward as-of join. ``on``: equi-key column name (same on both
    sides). ``right_payload``: right columns to attach (default: all but
    key/time). Ties (right_time == left_time) match, like DuckDB ASOF
    (>=) and pandas merge_asof. Output: every left column, plus each
    payload column (``+ suffix``)."""
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in (on, right_time)]

    rpay = F.struct(*[F.col(c) for c in right_payload])
    lpay = F.struct(*[F.col(c) for c in left.columns])

    # tie order: right rows sort BEFORE left rows at equal timestamps so
    # an equal-time right row is visible to the left row (>= semantics)
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        rpay.alias("__rpay"),
        F.lit(None).cast(
            "struct<" + ",".join(f"`{c}`:{left.schema[c].dataType.simpleString()}" for c in left.columns) + ">"
        ).alias("__lpay"),
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__rpay"].dataType).alias("__rpay"),
        lpay.alias("__lpay"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        r.unionByName(l)
        .withColumn("__match", F.last("__rpay", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    cols = [F.col(f"__lpay.`{c}`").alias(c) for c in left.columns]
    cols += [
        F.col(f"__match.`{c}`").alias(c + suffix) for c in right_payload
    ]
    return out.select(*cols)

"""Global contiguous row IDs without a single-reducer sort.

The naive way to number a corpus — ``row_number() OVER (ORDER BY key)``
with no PARTITION BY — collapses the whole dataset onto ONE reducer
(Spark warns "Moving all data to a single partition"); at 100 TB that is
not slow, it is impossible. The standard scalable shape implemented
here:

1. sample quantile boundaries of the leading order key (driver holds
   ``num_buckets - 1`` doubles — kilobytes),
2. assign each row a range bucket (a JVM higher-order fold over the
   boundary array — stays inside whole-stage codegen),
3. count rows per bucket with one partial-aggregated scan (map-side
   combine → ``num_buckets`` rows cross the wire),
4. turn counts into cumulative offsets on the driver (``num_buckets``
   integers) and broadcast them back,
5. ``row_number()`` partitioned BY BUCKET — one data shuffle, parallel
   across all buckets — plus the bucket's offset.

Because buckets are value-range-disjoint in the leading key and rows
with equal leading keys always land in the same bucket (the bucket is a
pure function of the key value), offset + local rank reproduces exactly
``row_number() OVER (ORDER BY *order_cols)`` — a total order, so the
assignment is deterministic and engine-independent, which is what makes
the DuckDB oracle an exact value check.

Skew: quantile boundaries equalize bucket sizes except for a single key
value carrying outsized mass (such a value cannot be split — its ties
must be ranked together). That residual skew is bounded by the heaviest
single key, not by data volume.

Cost: 2 scans of the source (count pass + numbering pass; the count
pass moves only ``num_buckets`` rows) and ONE shuffle of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def assign_row_ids(
    df: DataFrame,
    order_cols: list[str],
    num_buckets: int = 256,
    id_col: str = "row_id",
) -> DataFrame:
    """Add ``id_col``: 0-based contiguous IDs in ``order_cols`` order.

    ``order_cols[0]`` must be numeric (it feeds ``approxQuantile``);
    the full column list must form a total order (make the last column
    a unique key) — otherwise ranking ties are engine-arbitrary and IDs
    stop being reproducible. NULL leading keys are well-defined but
    Spark-specific: they fall into bucket 0 (every boundary comparison
    is NULL → excluded by the fold) and sort FIRST there (Spark's
    ascending default), i.e. NULLS FIRST overall — mirror that
    explicitly (``ORDER BY k NULLS FIRST``) when replaying the order in
    an engine whose default is NULLS LAST (DuckDB).
    """
    key0 = order_cols[0]
    n_b = max(1, num_buckets)
    qs = [i / n_b for i in range(1, n_b)]
    bounds = sorted(set(df.stat.approxQuantile(key0, qs, 0.001))) if qs else []
    if bounds:
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        # count of boundaries <= key == range-bucket index; a codegen
        # fold over a ≤256-element literal array, no Python
        bucket = F.size(
            F.filter(barr, lambda b: F.col(key0).cast("double") >= b)
        )
    else:
        bucket = F.lit(0)
    bucketed = df.withColumn("_b", bucket)

    counts = {
        r["_b"]: r["cnt"]
        for r in bucketed.groupBy("_b").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, running = [], 0
    for b in range(len(bounds) + 1):
        offsets.append((b, running))
        running += counts.get(b, 0)
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, "b: int, _offset: bigint")

    w = Window.partitionBy("_b").orderBy(*[F.col(c) for c in order_cols])
    return (
        bucketed.join(F.broadcast(off_df), bucketed["_b"] == off_df["b"])
        .withColumn(
            id_col,
            (F.col("_offset") + F.row_number().over(w) - 1).cast("bigint"),
        )
        .drop("_b", "b", "_offset")
    )

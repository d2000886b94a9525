"""Z-order (Morton) clustering for multi-dimensional data skipping.

Parquet row-group pruning works off per-file/per-group min-max stats.
Sorting by one column gives perfect skipping on that column and none on
any other; interleaving the bits of SEVERAL columns' bucket ranks (the
Z-order curve) gives good-not-perfect skipping on each of them
simultaneously — the standard layout for 100 TB tables queried by more
than one predicate column (same idea as Delta/Iceberg ``OPTIMIZE
ZORDER BY``; e.g. "Z-ordering" in the Delta Lake paper, VLDB 2020).

Mechanics, all JVM-side:

1. Each cluster column is bucketed to a ``bits``-bit integer rank —
   uniform ``width_bucket`` over the observed min/max by default (one
   tiny agg job), or quantile boundaries (``approxQuantile``) when the
   data is skewed.
2. Ranks are bit-interleaved into the Z-value with a runtime
   ``aggregate(sequence(...))`` fold rather than 2·bits unrolled
   shift expressions — keeps the generated codegen class small (large
   unrolled expression families thrash the janino codegen cache).
3. ``repartitionByRange`` on the Z-value (sampled range boundaries →
   balanced files), then ``sortWithinPartitions`` so row groups within
   a file are also Z-contiguous.

The Z-value is layout-only and is dropped before the write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 12


def _bucket_uniform(col: str, lo: float, hi: float, bits: int) -> Column:
    n = (1 << bits) - 2  # width_bucket returns 0..n+1; clamp into bits
    # lo/hi are None on empty input (min/max of zero rows); degenerate
    # ranges rank constant-zero either way
    if lo is None or hi is None or hi <= lo:
        return F.lit(0).cast("long")
    return F.expr(
        f"width_bucket(cast(`{col}` as double), {lo!r}, {hi!r}, {n})"
    ).cast("long")


def _bucket_quantile(col: str, bounds: list[float]) -> Column:
    # rank = number of boundaries <= value; fold over a literal array so
    # the expression stays one small loop regardless of boundary count
    arr = "array(" + ",".join(repr(b) for b in bounds) + ")"
    return F.expr(
        f"aggregate({arr}, 0L, (acc, b) ->"
        f" acc + if(cast(`{col}` as double) >= b, 1L, 0L))"
    )


def zorder_value(rank_col_names: list[str], bits: int = DEFAULT_BITS) -> Column:
    """Interleave ``bits`` low bits of each (long) rank column into one
    Morton value (column j owns every len(cols)-th bit, from bit j up)."""
    k = len(rank_col_names)
    z = F.lit(0).cast("long")
    for j, name in enumerate(rank_col_names):
        # fold over bit positions at runtime: small generated class
        z = z.bitwiseOR(F.expr(
            f"aggregate(sequence(0, {bits - 1}), 0L,"
            f" (acc, i) -> acc | shiftleft(shiftright(`{name}`, i) & 1L,"
            f" i * {k} + {j}))"
        ))
    return z


def with_zorder(
    df: DataFrame,
    cluster_cols: list[str],
    bits: int = DEFAULT_BITS,
    quantile_buckets: bool = False,
) -> DataFrame:
    """Add a ``__zvalue`` column. One driver-side stats pass (min/max
    agg, or approxQuantile when ``quantile_buckets``) sizes the bucket
    grid; everything per-row is built-in Column algebra."""
    if quantile_buckets:
        probs = [i / (1 << bits) for i in range(1, 1 << bits)]
        quantiles = df.approxQuantile(cluster_cols, probs, 0.001)
        ranks = [
            _bucket_quantile(c, sorted(set(qs)))
            for c, qs in zip(cluster_cols, quantiles)
        ]
    else:
        stats = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"lo_{i}") for i, c in enumerate(cluster_cols)],
            *[F.max(F.col(c).cast("double")).alias(f"hi_{i}") for i, c in enumerate(cluster_cols)],
        ).collect()[0]
        ranks = [
            _bucket_uniform(c, stats[f"lo_{i}"], stats[f"hi_{i}"], bits)
            for i, c in enumerate(cluster_cols)
        ]
    out = df
    for j, r in enumerate(ranks):
        out = out.withColumn(f"__zr_{j}", r)
    out = out.withColumn(
        "__zvalue", zorder_value([f"__zr_{j}" for j in range(len(ranks))], bits)
    )
    return out.drop(*[f"__zr_{j}" for j in range(len(ranks))])


def write_zordered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int,
    bits: int = DEFAULT_BITS,
    quantile_buckets: bool = False,
    mode: str = "error",
) -> None:
    """Write ``df`` as ``num_files`` parquet files clustered on the
    Z-curve of ``cluster_cols``: range-partition by Z-value (balanced
    files) + sort within partitions (Z-contiguous row groups)."""
    z = with_zorder(df, cluster_cols, bits, quantile_buckets)
    (
        z.repartitionByRange(num_files, F.col("__zvalue"))
        .sortWithinPartitions("__zvalue")
        .drop("__zvalue")
        .write.mode(mode)
        .parquet(path)
    )

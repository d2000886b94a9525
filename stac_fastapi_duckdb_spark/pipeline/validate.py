"""Dataset validation: order-invariant fingerprints for cross-stage
pipeline integrity checks.

A 100 TB pipeline copies/transforms a corpus across many stages
(ingest → dedup → filter → shuffle-shard → tokenize); verifying that a
stage preserved the data it was supposed to preserve cannot afford a
global sort or a row-by-row diff. An ORDER-INVARIANT per-column
checksum — commutative aggregates over a row hash — compares two
copies with one scan each and a kilobyte of output, regardless of
partitioning, file order, or cluster layout.

All hashing is md5-derived (low 60 bits — fits a signed 64-bit int in
any engine) so an external system (or the DuckDB oracle) can recompute
the identical fingerprint without Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# sums of (h % _SUM_MOD) stay far below 2^63 for any realistic row
# count (9.2e18 / 1e9 ≈ 9.2e9 rows per partition-free overflow bound)
_SUM_MOD = 1_000_000_007


def _row_hash(col: str):
    """Low 60 bits of md5 of the canonical string — engine-neutral
    (NULL propagates: a NULL cell contributes to n_nulls, never to the
    hash aggregates)."""
    return F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 18, 15), 16, 10
    ).cast("long")


def dataset_fingerprint(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """→ one row per column: (col_name, n_rows, n_nulls, xor_hash,
    sum_hash). Two datasets are content-equal as multisets of rows per
    column iff their fingerprints match (xor catches membership flips,
    the modular sum catches the duplicate-pair swaps xor is blind to,
    and the two together make accidental collision astronomically
    unlikely).

    Scale shape: ONE scan, all columns' aggregates computed in a
    single partial-aggregate pass (map-side combine reduces every
    partition to one row); the final exchange moves bytes, not data.
    The 1-row result is then unpivoted driver-free with ``stack``.

    Caveat (documented, not hidden): canonical-string hashing of
    FLOAT columns is engine-specific formatting — restrict ``cols`` to
    int/string/date columns when comparing across engines; within
    Spark any type is fine.
    """
    cols = list(cols) if cols else df.columns
    aggs = []
    for c in cols:
        h = _row_hash(c)
        aggs += [
            F.count(F.lit(1)).alias(f"__n__{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__nn__{c}"),
            F.bit_xor(h).alias(f"__x__{c}"),
            F.sum(F.pmod(h, F.lit(_SUM_MOD))).cast("long").alias(f"__s__{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__n__{c}`, `__nn__{c}`, `__x__{c}`, `__s__{c}`" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_rows, n_nulls, xor_hash, sum_hash)"
        )
    )


def fingerprints_match(a: DataFrame, b: DataFrame) -> bool:
    """Driver-side equality of two fingerprint frames (tiny: one row
    per column)."""
    ra = {tuple(r) for r in a.collect()}
    rb = {tuple(r) for r in b.collect()}
    return ra == rb

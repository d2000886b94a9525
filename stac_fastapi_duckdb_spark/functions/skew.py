"""Skew-mitigation utilities: salted two-phase aggregation and salted
joins.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew for sort-merge joins; these helpers cover the cases AQE cannot
re-plan:

- a groupBy whose key distribution is pathological (one key = 30% of a
  100 TB table → one reducer gets 30 TB): ``two_phase_agg`` salts the
  key so the first shuffle spreads the hot key over N reducers, then
  re-aggregates the N partials — algebraic aggregates (sum/count/min/
  max) compose exactly, so the result is identical to a direct groupBy.
- a join against a table too big to broadcast where one key dominates:
  ``salted_join`` salts the skewed side and explodes the other side
  ×buckets so each hot-key shard meets its match.

Salt assignment uses ``rand(seed)`` — which rows land in which shard is
partition-order dependent, but the OPERATOR RESULT is provably
assignment-independent (aggregates are algebraic; the join is exact).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def _salt_col(buckets: int, seed: int) -> Column:
    return F.floor(F.rand(seed) * buckets).cast("int")


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    specs: dict[str, tuple[str, Column | str]],
    buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Salted partial aggregation for skewed group keys.

    ``specs``: out_alias → (fn, column) with fn ∈ {sum, count, min, max}
    (the algebraic aggregates whose partials re-combine exactly).
    Equivalent to ``df.groupBy(keys).agg(...)`` for ANY salt assignment.
    """
    partial_aggs, final_aggs = [], []
    for alias, (fn, col) in specs.items():
        col = F.col(col) if isinstance(col, str) else col
        p = f"__p_{alias}"
        if fn == "sum":
            partial_aggs.append(F.sum(col).alias(p))
            final_aggs.append(F.sum(p).alias(alias))
        elif fn == "count":
            partial_aggs.append(F.count(col).alias(p))
            final_aggs.append(F.sum(p).alias(alias))
        elif fn == "min":
            partial_aggs.append(F.min(col).alias(p))
            final_aggs.append(F.min(p).alias(alias))
        elif fn == "max":
            partial_aggs.append(F.max(col).alias(p))
            final_aggs.append(F.max(p).alias(alias))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r}")
    salted = df.withColumn(_SALT, _salt_col(buckets, seed))
    partial = salted.groupBy(*keys, _SALT).agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the LEFT (skewed) side salted and the RIGHT side
    replicated ×buckets. Row-identical to ``left.join(right, on, how)``
    for inner/left joins; right rows cost buckets× shuffle volume — use
    only when the right side is modest but above broadcast threshold.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    l = left.withColumn(_SALT, _salt_col(buckets, seed))
    r = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    joined = l.join(r, on + [_SALT], how)
    return joined.drop(_SALT)


def skewed_key_stats(df: DataFrame, keys: list[str], top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts + share of total, descending —
    the 'should I salt this?' report."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    total = df.count()
    return (
        counts.withColumn("share", F.round(F.col("n") / F.lit(total), 6))
        .orderBy(F.col("n").desc(), *[F.col(k).asc() for k in keys])
        .limit(top)
    )

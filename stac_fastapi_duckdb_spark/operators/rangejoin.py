"""Range (point-in-interval) join — Spark's second missing interval
operator besides as-of.

Naive SQL ``l JOIN r ON l.t BETWEEN r.start AND r.end`` compiles to a
broadcast-nested-loop or cartesian product: O(|L|·|R|) comparisons. The
scalable shape bucketizes time into fixed granules:

1. each point maps to its granule (one row),
2. each interval explodes to every granule it covers (len/granule rows —
   pick the granule near the TYPICAL interval length so this stays
   small),
3. equi-join on (key, granule) — a plain shuffled hash join — then the
   exact BETWEEN predicate filters granule-edge false positives,
4. distinct is unnecessary: a (point, interval) pair meets in exactly
   the point's one granule.

Cost: one equi-shuffle of |L| + |R|·avg_span/granule rows. Same trick
Sedona/range-join optimizers apply under the hood; expressed here in
pure DataFrame algebra so Catalyst handles it like any equi-join
(AQE, broadcast if a side is small, skew split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str,
    start: str,
    end: str,
    on: str | None = None,
    granule_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row containing it
    (``start <= t <= end``), optionally also matching an equi-key
    ``on``. Returns points columns + intervals columns.

    ``granule_seconds``: bucket width; choose ≈ median interval length
    (too small → interval explosion; too large → more false positives
    filtered after the join).
    """
    g = F.lit(granule_seconds)
    p_gran = (F.unix_timestamp(F.col(point_time)) / g).cast("long")
    i_from = (F.unix_timestamp(F.col(start)) / g).cast("long")
    i_to = (F.unix_timestamp(F.col(end)) / g).cast("long")

    p = points.withColumn("__gran", p_gran)
    i = intervals.withColumn(
        "__gran", F.explode(F.sequence(i_from, i_to))
    )
    keys = ["__gran"] if on is None else [on, "__gran"]
    exact = (F.col(point_time) >= F.col(start)) & (
        F.col(point_time) <= F.col(end)
    )
    return p.join(i, keys, how).filter(exact).drop("__gran")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    on: str | None = None,
    granule_seconds: int = 3600,
) -> DataFrame:
    """Interval × interval overlap join (``l.start <= r.end AND
    r.start <= l.end``, closed ends), optionally with an equi-key —
    the temporal/genomic workhorse whose naive SQL is a nested loop.

    Same granule decomposition as the point join, on BOTH sides — but
    an overlapping pair meets in EVERY shared granule, so the naive
    equi-join emits duplicates. Instead of a distinct (a second full
    shuffle of the output), each pair is kept only at its canonical
    meeting granule — the LATER of the two start granules, i.e. the
    first granule the intervals share: ``__gran ==
    greatest(l_start_granule, r_start_granule)``. Every qualifying
    pair then appears exactly once, straight out of the join.

    Column names of ``left`` and ``right`` must be disjoint apart from
    the optional ``on`` key (pre-alias the frames, as with as-of).
    Returns left columns + right columns.
    """
    g = F.lit(granule_seconds)

    def gran(col):
        return F.floor(F.unix_timestamp(F.col(col)) / g).cast("long")

    l = (
        left.withColumn("__gs_l", gran(l_start))
        .withColumn("__gran", F.explode(F.sequence(gran(l_start), gran(l_end))))
    )
    r = (
        right.withColumn("__gs_r", gran(r_start))
        .withColumn("__gran", F.explode(F.sequence(gran(r_start), gran(r_end))))
    )
    keys = ["__gran"] if on is None else [on, "__gran"]
    overlap = (F.col(l_start) <= F.col(r_end)) & (
        F.col(r_start) <= F.col(l_end)
    )
    canonical = F.col("__gran") == F.greatest(F.col("__gs_l"), F.col("__gs_r"))
    return (
        l.join(r, keys)
        .filter(overlap & canonical)
        .drop("__gran", "__gs_l", "__gs_r")
    )

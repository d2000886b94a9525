"""Mergeable frequency/distinct sketches with DETERMINISTIC,
engine-replayable constructions: KMV (approximate COUNT DISTINCT) and
count-min (approximate per-item frequency under a fixed memory bound).

KMV (k-minimum-values) distinct sketches: mergeable approximate
COUNT DISTINCT with a DETERMINISTIC, engine-replayable construction.

Spark's built-in ``approx_count_distinct`` (HyperLogLog++) is the
day-to-day tool, but its register layout is engine-private — no other
system can verify its numbers. A KMV sketch over an md5-derived uniform
hash is the open-algorithm alternative: the sketch is *the k smallest
distinct hash values*, a pure function of the value set — identical in
any engine that can compute md5, which is what lets the DuckDB oracle
value-check the estimate bit-for-bit. Estimator (Bar-Yossef et al.,
"Counting distinct elements in a data stream", RANDOM 2002):

    distinct < k            →  exact (the sketch IS the value set)
    else                    →  (k-1) / U_(k),  U_(k) = kth_min / 2^60

Mergeability: union two sketches by merging the arrays and re-taking
the k smallest — the same operation the second aggregation level below
performs, so per-partition / per-day sketches roll up without touching
raw data.

Scale shape — the k-min aggregation is TWO-LEVEL so no aggregation
cell ever sees a whole group:

  level 1  groupBy(group, h % num_salts) → per-cell sorted k-min array
           (cell state ≈ distinct/num_salts hashes; size num_salts to
           taste for the group cardinality you expect),
  level 2  groupBy(group) merges ≤ num_salts arrays of ≤ k each —
           bounded by num_salts·k longs per group, independent of data.

Salting by ``h % num_salts`` keeps duplicate hashes inside one cell,
so no cross-salt re-dedup is needed. Two partial-aggregated shuffles,
both carrying hashes (16 B/row then ≤ num_salts·k·8 B/group), never
the values themselves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# hashes are uniform in [0, 2^60) — md5's low 60 bits, which fit a
# signed 64-bit integer in every engine (no unsigned-cast divergence)
_HASH_SPACE = float(1 << 60)


def kmv_hash(col: Column) -> Column:
    """Uniform 60-bit hash of a value: low 15 hex digits of md5."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 18, 15), 16, 10
    ).cast("long")


def kmv_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    num_salts: int = 64,
) -> DataFrame:
    """→ (group_col, sk: array<long>) — the k smallest distinct hashes
    of ``value_col`` per group. Persist this artifact to merge later
    (see module docstring); ``kmv_estimate`` turns it into a count."""
    h = kmv_hash(F.col(value_col)).alias("h")
    lvl1 = (
        df.select(F.col(group_col), h)
        .groupBy(group_col, F.pmod(F.col("h"), F.lit(num_salts)).alias("_s"))
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("_hs"))
    )
    return lvl1.groupBy(group_col).agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("_hs"))), 1, k).alias("sk")
    )


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """→ (group_col, sketch_size, est_distinct): the KMV estimator over
    a ``kmv_sketch`` artifact. Exact below k; (k-1)/U_(k) above. All
    arithmetic is IEEE-double on exact integer inputs — deterministic,
    so the estimate itself (not just the sketch) oracle-matches."""
    n_sk = F.size("sk")
    kth = F.element_at("sk", k).cast("double")
    est = F.when(n_sk < k, n_sk.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / kth
    )
    group_cols = [c for c in sketch.columns if c != "sk"]
    return sketch.select(
        *group_cols,
        n_sk.cast("int").alias("sketch_size"),
        F.round(est, 4).alias("est_distinct"),
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    num_salts: int = 64,
) -> DataFrame:
    """Sketch + estimate in one call: per-group approximate distinct
    count of ``value_col``. Relative error ≈ 1/sqrt(k-2) (~13% at
    k=64, ~4% at k=512)."""
    return kmv_estimate(kmv_sketch(df, group_col, value_col, k, num_salts), k)


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------
#
# The CMS (Cormode & Muthukrishnan, "An improved data stream summary:
# the count-min sketch and its applications", J. Algorithms 2005)
# answers "how often does item x occur?" in depth×width integers,
# regardless of corpus size: d independent hash rows, each counting
# into w cells; estimate = min over rows (always ≥ the true count —
# one-sided error ≤ 2N/w with prob 1-2^-d).  At 100 TB this is the
# frequency companion to KMV: per-shard sketches are built with ONE
# partially-aggregated shuffle bounded by d·w rows per partition, then
# merged cell-wise (``cms_merge``) without touching raw data — exact
# token counts at that scale need a full groupBy over the corpus
# vocabulary, while the CMS answer is a constant-size artifact.
#
# Hashing is md5-derived (first 8 hex of md5("{seed}:{row}:{value}"),
# mod width) — a pure function of the value, identical in any engine
# with md5, so the DuckDB oracle replays the SKETCH and the ESTIMATES
# bit-for-bit (same contract as kmv_hash).


def cms_cell(col: Column, row: int, width: int, seed: str = "cms-v1") -> Column:
    """Row-``row`` cell index of a value: 32-bit md5-derived hash mod
    width.  Deterministic and engine-replayable."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(seed), F.lit(str(row)), col.cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(width))


def cms_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 512,
    seed: str = "cms-v1",
) -> DataFrame:
    """→ (row, cell, cnt): the depth×width count table.  One
    posexplode (d rows per input row, map-side combined immediately) +
    one partial-aggregated shuffle carrying ≤ partitions·d·w rows."""
    cells = F.array(
        *[cms_cell(F.col(value_col), r, width, seed) for r in range(depth)]
    )
    return (
        df.select(F.posexplode(cells).alias("row", "cell"))
        .groupBy("row", "cell")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two sketches built with identical
    (depth, width, seed) — the union-corpus sketch."""
    return (
        a.unionByName(b)
        .groupBy("row", "cell")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 512,
    seed: str = "cms-v1",
) -> DataFrame:
    """Estimated count for each probe value: min over the d rows of the
    probe's cell counts (an absent cell is 0).  The sketch (d·w rows)
    is broadcast — probing never shuffles the probe side."""
    p = probes.select(
        F.col(value_col),
        F.posexplode(
            F.array(
                *[cms_cell(F.col(value_col), r, width, seed) for r in range(depth)]
            )
        ).alias("row", "cell"),
    )
    return (
        p.join(F.broadcast(sketch), ["row", "cell"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_n"))
    )

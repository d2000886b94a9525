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


def cms_sketch_from_counts(
    df: DataFrame,
    value_col: str,
    count_col: str,
    depth: int = 4,
    width: int = 512,
    seed: str = "cms-v1",
) -> DataFrame:
    """Build the SAME d×w sketch from an already-aggregated
    ``(value, count)`` table — CMS is linear, so summing each distinct
    value's count into its cells is cell-for-cell identical to hashing
    every raw occurrence, while computing d md5s per DISTINCT value
    instead of per instance (200× fewer hashes on a 10M-token corpus
    with a 50k vocabulary). Use when an exact per-value aggregate
    already exists in the pipeline; ``cms_sketch`` remains the raw
    single-pass form."""
    cells = F.array(
        *[cms_cell(F.col(value_col), r, width, seed) for r in range(depth)]
    )
    return (
        df.select(F.col(count_col), F.posexplode(cells).alias("row", "cell"))
        .groupBy("row", "cell")
        .agg(F.sum(count_col).cast("long").alias("cnt"))
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


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------
#
# HLL (Flajolet, Fusy, Gandouet, Meunier, "HyperLogLog: the analysis of
# a near-optimal cardinality estimation algorithm", AofA 2007) is the
# third member of the sketch family: CONSTANT-size distinct counting
# (m = 2^p small integers per group, vs KMV's k hashes), mergeable by
# element-wise max — the right artifact when sketches for millions of
# groups / days / shards must be stored and rolled up.  Spark's own
# ``approx_count_distinct`` is HLL++ with an engine-private register
# layout; this one is open and DETERMINISTIC end-to-end so the DuckDB
# oracle replays registers AND estimate bit-for-bit:
#
#   hash      60-bit md5-derived (kmv_hash — shared hash contract)
#   register  h mod m            (low p bits)
#   rank      leading zeros of the remaining (60-p)-bit word + 1,
#             via length(bin(w)) — exact integer bit-length in both
#             engines, no floating log2
#   Z         computed as the INTEGER sum ZI = Σ_j 2^((61-p) - M_j)
#             (≤ 2^61, exact in int64 — so the harmonic mean is
#             order-independent and engine-identical; the only float
#             ops are one int→double conversion and one division)
#   estimate  alpha_m·m²/Z, with the standard linear-counting branch
#             m·ln(m/V) when raw ≤ 2.5m and V (zero registers) > 0
#
# Scale shape: one partially-aggregated shuffle of (group, reg)→max
# cells — bounded by groups·m rows regardless of input size — then a
# groups-sized densification.  No driver state, no raw values moved.

_HLL_BITS = 60


def hll_register_cols(col: Column, p: int) -> tuple[Column, Column]:
    """(register, rank) of one value under precision ``p``."""
    m = 1 << p
    h = kmv_hash(col)
    w = F.shiftright(h, p)  # remaining (60-p)-bit word
    rank = (
        F.when(w == 0, F.lit(_HLL_BITS - p + 1))
        .otherwise(F.lit(_HLL_BITS - p + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return F.pmod(h, F.lit(m)).cast("int"), rank


def hll_sketch(
    df: DataFrame, group_col: str, value_col: str, p: int = 9
) -> DataFrame:
    """→ (group_col, regs: array<int> of length 2^p) — the dense HLL
    register vector per group.  Persist to merge later (``hll_merge``);
    ``hll_estimate`` turns it into a count.  ``p`` must be ≥ 9 so the
    integer harmonic sum fits int64 (and ≤ 16 — 64 KiB of registers is
    past the point where KMV is the better artifact anyway)."""
    assert 9 <= p <= 16, "hll_sketch: p must be in [9, 16]"
    m = 1 << p
    reg, rank = hll_register_cols(F.col(value_col), p)
    cells = (
        df.select(F.col(group_col), reg.alias("_reg"), rank.alias("_rk"))
        .groupBy(group_col, "_reg")
        .agg(F.max("_rk").alias("_mx"))
    )
    dense = cells.groupBy(group_col).agg(
        F.map_from_entries(F.collect_list(F.struct("_reg", "_mx"))).alias("_m")
    )
    idx = F.sequence(F.lit(0), F.lit(m - 1))
    return dense.select(
        group_col,
        F.transform(
            idx, lambda i: F.coalesce(F.element_at(F.col("_m"), i), F.lit(0))
        ).alias("regs"),
    )


def hll_merge(a: DataFrame, b: DataFrame, group_col: str) -> DataFrame:
    """Element-wise max of register vectors — the union-set sketch.
    Works on any two ``hll_sketch`` outputs built with the same p."""
    return (
        a.unionByName(b)
        .groupBy(group_col)
        .agg(
            F.aggregate(
                F.collect_list("regs"),
                F.lit(None).cast("array<int>"),
                lambda acc, x: F.when(acc.isNull(), x).otherwise(
                    F.zip_with(acc, x, lambda u, w: F.greatest(u, w))
                ),
            ).alias("regs")
        )
    )


def hll_estimate(sketch: DataFrame, p: int = 9) -> DataFrame:
    """→ (group cols…, zero_regs, est_distinct): the HLL estimator.
    Relative error ≈ 1.04/sqrt(m) (~4.6 % at p=9).  The harmonic sum is
    exact-integer (see module notes) so the estimate replays
    bit-for-bit in any engine with md5 + IEEE doubles."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # Σ 2^(-M_j) scaled by 2^(61-p) (ranks reach 61-p, so this is the
    # smallest power keeping every term integral): exact int64 — the
    # sum is ≤ m·2^(61-p) = 2^61
    zi = F.aggregate(
        F.col("regs"),
        F.lit(0).cast("long"),
        lambda acc, r: acc
        + F.pow(
            F.lit(2.0), (F.lit(_HLL_BITS - p + 1) - r).cast("double")
        ).cast("long"),
    )
    v = F.size(F.filter(F.col("regs"), lambda r: r == 0))
    # alpha·m²/Z = (alpha·m²·2^(61-p)) / ZI — one division on a
    # deterministically-rounded int→double conversion
    c = alpha * m * m * float(1 << (_HLL_BITS - p + 1))
    raw = F.lit(c) / zi.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    group_cols = [col for col in sketch.columns if col != "regs"]
    return sketch.select(
        *group_cols,
        v.cast("int").alias("zero_regs"),
        F.round(est, 4).alias("est_distinct"),
    )


def hll_distinct(
    df: DataFrame, group_col: str, value_col: str, p: int = 9
) -> DataFrame:
    """Sketch + estimate in one call: per-group approximate distinct
    count in 2^p ints of state per group."""
    return hll_estimate(hll_sketch(df, group_col, value_col, p), p)


# ---------------------------------------------------------------------------
# KMV set operations (theta-sketch style overlap)
# ---------------------------------------------------------------------------


def kmv_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    k: int = 256,
    num_salts: int = 64,
) -> DataFrame:
    """Audience-overlap estimate between two value sets from their KMV
    sketches (the theta-sketch intersection, Dasgupta et al., "Theta-
    sketch framework: estimation over streams with set operations",
    2016): θ = min of the two sketches' k-th minimum hashes (or the
    full hash space for a sub-k exact sketch); every hash below θ is a
    uniform sample of its set with inclusion probability θ/space, so

        |A∩B| ≈ |{h ∈ skA ∩ skB : h < θ}| · space/θ

    → one row: (n_a, n_b, n_inter — retained-sample counts,
    est_a, est_b, est_intersection, est_jaccard).  Jaccard is a pure
    count ratio (θ cancels), so it is exact when both sets fit their
    sketches.  Deterministic md5 hashing end-to-end — the DuckDB
    oracle replays sketches, θ, and all four estimates bit-for-bit.

    Scale shape: each side is the bounded two-level KMV aggregation
    (never more than num_salts·k longs per side in flight); the
    combine is a 1×1 join of two k-length arrays.
    """
    def side(df: DataFrame, name: str) -> DataFrame:
        # same two-level bounded aggregation as kmv_sketch, but the
        # merge level is a GLOBAL agg — one row even for an empty set
        # (an empty sketch, θ = full space), not zero rows
        lvl1 = (
            df.select(kmv_hash(F.col(value_col)).alias("h"))
            .groupBy(F.pmod(F.col("h"), F.lit(num_salts)).alias("_s"))
            .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("_hs"))
        )
        return lvl1.agg(
            F.slice(
                F.array_sort(F.flatten(F.collect_list("_hs"))), 1, k
            ).alias(name)
        )

    j = side(df_a, "sk_a").crossJoin(side(df_b, "sk_b"))  # 1 row × 1 row

    # θ stays int64: hashes exceed double's 53-bit mantissa, so the
    # retain/drop comparison must never round
    def theta(sk: Column) -> Column:
        return F.when(F.size(sk) < k, F.lit(1 << _HLL_BITS)).otherwise(
            F.element_at(sk, k)
        )

    th = F.least(theta(F.col("sk_a")), theta(F.col("sk_b")))

    def below(sk: Column) -> Column:
        return F.filter(sk, lambda h: h < th)

    j = j.select(
        F.size(below(F.col("sk_a"))).alias("n_a"),
        F.size(below(F.col("sk_b"))).alias("n_b"),
        F.size(F.array_intersect(below(F.col("sk_a")), below(F.col("sk_b")))).alias(
            "n_inter"
        ),
        th.alias("_th"),
    )
    scale = F.lit(_HASH_SPACE) / F.col("_th").cast("double")
    denom = (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
    return j.select(
        "n_a",
        "n_b",
        "n_inter",
        F.round(F.col("n_a") * scale, 4).alias("est_a"),
        F.round(F.col("n_b") * scale, 4).alias("est_b"),
        F.round(F.col("n_inter") * scale, 4).alias("est_intersection"),
        F.round(
            F.when(denom == 0, F.lit(0.0)).otherwise(
                F.col("n_inter").cast("double") / denom
            ),
            6,
        ).alias("est_jaccard"),
    )

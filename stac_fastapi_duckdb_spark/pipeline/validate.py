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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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


def distribution_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    bin_width: float,
    epsilon: float = 1e-6,
) -> DataFrame:
    """Population-stability drift between two snapshots of a numeric
    column: fixed-width binning, then the per-bin PSI term
    ``(p_a - p_b) * ln((p_a + ε)/(p_b + ε))`` — the standard
    data-validation check that a pipeline stage (or a new ingest
    batch) did not shift a distribution it should have preserved.
    Interpretation is the usual PSI rule of thumb (Σ < 0.1 stable,
    > 0.25 shifted); ε-smoothing keeps bins present on only one side
    finite.

    → one row per occupied bin: (bin, n_a, n_b, p_a, p_b, psi_term);
    Σ psi_term is the PSI. Per-bin output (not just the scalar) is
    deliberate: the actionable artifact is WHICH bins moved.

    Scale shape: one partial-aggregated groupBy per snapshot (map-side
    combine reduces each partition to ≤ #bins rows), then a full-outer
    join of two bin-count tables whose size is #bins — the 100 TB
    inputs are each scanned once and never joined row-to-row. Bin
    edges are FIXED (caller-supplied width), not data-derived: a
    quantile-based binning would need an extra pass and make the two
    sides' bins incomparable.
    """
    def binned(df: DataFrame, n_col: str) -> DataFrame:
        return (
            df.groupBy(
                F.floor(F.col(value_col) / F.lit(float(bin_width)))
                .cast("bigint")
                .alias("bin")
            )
            .agg(F.count(F.lit(1)).alias(n_col))
        )

    ca, cb = binned(a, "n_a"), binned(b, "n_b")
    joined = (
        ca.join(cb, "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )
    ta = F.sum("n_a").over(Window.partitionBy())
    tb = F.sum("n_b").over(Window.partitionBy())
    pa = F.col("n_a") / ta
    pb = F.col("n_b") / tb
    eps = F.lit(float(epsilon))
    return joined.select(
        "bin",
        "n_a",
        "n_b",
        F.round(pa, 6).alias("p_a"),
        F.round(pb, 6).alias("p_b"),
        # + 0.0 normalizes IEEE negative zero (a tiny negative term
        # rounds to -0.0, which value-hash comparison renders signed)
        (F.round((pa - pb) * F.log((pa + eps) / (pb + eps)), 6) + F.lit(0.0))
        .alias("psi_term"),
    )


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column data profile: row/null/distinct counts and
    lexicographic min/max of the canonical string — the quick-look
    companion to ``dataset_fingerprint`` (fingerprints answer "did it
    change", the profile answers "what does it look like" after every
    pipeline stage).

    → one row per column: (col_name, n_rows, n_nulls, n_distinct,
    min_str, max_str).

    Scale shape: ONE scan. The multiple COUNT(DISTINCT)s compile to a
    single Expand-based aggregate (each input row fans out to
    #cols rows of (gid, value) — the standard Spark multi-distinct
    plan), so cost is #cols × scan, partial-aggregated map-side; no
    joins, no windows. For columns where an exact distinct is too hot
    at full scale, swap in approx_count_distinct — kept exact here
    because the oracle compares values.
    """
    cols = list(cols) if cols else df.columns
    aggs = []
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.count(F.lit(1)).alias(f"__n__{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__nn__{c}"),
            F.countDistinct(s).alias(f"__nd__{c}"),
            F.min(s).alias(f"__mn__{c}"),
            F.max(s).alias(f"__mx__{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__n__{c}`, `__nn__{c}`, `__nd__{c}`, `__mn__{c}`, `__mx__{c}`"
        for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_rows, n_nulls, n_distinct, min_str, max_str)"
        )
    )


def trend_fit(
    df: DataFrame,
    x: Column,
    y: Column,
    group_col: str | None = None,
) -> DataFrame:
    """Per-group ordinary-least-squares trend line in closed form:
    slope = cov(x,y)/var(x), intercept = ȳ − slope·x̄, r² = corr² — the
    metric-drift primitive behind "is quality decaying over time"
    dashboards: ONE partial-aggregated scan, a group's aggregate state
    is five sums (bytes), no window, no sort, any data volume.

    Numeric contract: ``x`` must be integer-valued (e.g. epoch seconds
    — cast to long here) and ``y`` is accumulated as DECIMAL(18,6)
    (i.e. fitted at 1e-6 granularity). That makes every moment an
    EXACT, accumulation-order-independent sum — the result is
    bit-stable under repartitioning and engine-identical (float
    co-moment merges differ in the last ulp per accumulation order;
    exact sums cannot). The closed form is then evaluated once in
    doubles on identical inputs. Center x near zero before calling:
    Sxx for epoch-scale x overflows even wide decimals, and the final
    double closed form cancels catastrophically.

    → (group?, n, slope, intercept, r2); degenerate groups (constant x
    or constant y, or < 2 rows) report NULLs rather than ±inf.
    """
    xi = x.cast("long")
    yi = y.cast("decimal(18,6)")
    base = df.select(
        *([group_col] if group_col else []), xi.alias("_x"), yi.alias("_y")
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("_x").cast("decimal(38,0)")).alias("_sx"),
        # x*x stays exact in long for |x| < 3e9 (the center-x contract);
        # the decimal cast only protects the SUM from overflow
        F.sum((F.col("_x") * F.col("_x")).cast("decimal(38,0)")).alias("_sxx"),
        F.sum(F.col("_y")).alias("_sy"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        F.sum(F.col("_x").cast("decimal(19,0)") * F.col("_y")).alias("_sxy"),
    ]
    g = base.groupBy(group_col).agg(*aggs) if group_col else base.agg(*aggs)
    # identical double closed form over exact sums (cast once)
    n = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sxx = F.col("_sxx").cast("double")
    sy = F.col("_sy").cast("double")
    syy = F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    dx = n * sxx - sx * sx  # n²·var_pop(x)
    dy = n * syy - sy * sy
    cov_n = n * sxy - sx * sy
    slope = F.when(dx > 0, cov_n / dx)
    r2 = F.when((dx > 0) & (dy > 0), (cov_n * cov_n) / (dx * dy))
    return g.select(
        *([group_col] if group_col else []),
        "n",
        (F.round(slope, 6) + F.lit(0.0)).alias("slope"),
        (F.round((sy - slope * sx) / n, 6) + F.lit(0.0)).alias("intercept"),
        (F.round(r2, 6) + F.lit(0.0)).alias("r2"),
    )


def snapshot_diff(
    df_a: DataFrame,
    df_b: DataFrame,
    id_col: str,
    compare_cols: list[str],
    summary: bool = True,
) -> DataFrame:
    """Row-level delta between two snapshots of a keyed dataset —
    "what did this pipeline stage change": every key classified as
    ``added`` (B only), ``removed`` (A only), ``changed`` (both, any
    compared column differs) or ``unchanged``. The companion to
    ``dataset_fingerprint``: the fingerprint says WHETHER two copies
    differ in one scan; the diff says WHERE, with one join.

    Comparison is by md5 row-hash over the canonical string forms of
    ``compare_cols`` (NULL-tagged so NULL ≠ 'None' ≠ ''), so the join
    carries (key, 16-byte hash) per side — never the row bodies. One
    sort-merge (or co-partitioned, if both snapshots are bucketed by
    the key — the layout a recurring diff job should write) full-outer
    join on the key.

    → summary=True: (status, n) — the dashboard row. summary=False:
    (id, status) per non-unchanged key for drill-down.
    """
    def hashed(df: DataFrame, side: str) -> DataFrame:
        parts = []
        for c in compare_cols:
            parts.append(
                F.when(F.col(c).isNull(), F.lit("\x00null"))
                .otherwise(F.col(c).cast("string"))
            )
        return df.select(
            F.col(id_col).alias("_id"),
            F.md5(F.concat_ws("\x01", *parts)).alias(f"_h_{side}"),
        )

    a = hashed(df_a, "a")
    b = hashed(df_b, "b")
    joined = a.join(b, "_id", "full_outer")
    status = (
        F.when(F.col("_h_a").isNull(), F.lit("added"))
        .when(F.col("_h_b").isNull(), F.lit("removed"))
        .when(F.col("_h_a") != F.col("_h_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    classified = joined.select(F.col("_id").alias(id_col), status.alias("status"))
    if summary:
        return classified.groupBy("status").agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        )
    return classified.filter(F.col("status") != "unchanged")


def rolling_count_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    trailing: int = 24,
    k: int = 20,
) -> DataFrame:
    """Hours whose per-group event count deviates most from the
    trailing ``trailing``-hour baseline — the volume-anomaly monitor
    every ingest pipeline runs.

    Per (group, hour) counts (ONE partial-aggregated shuffle over the
    raw events), then a per-group ordered window carrying three EXACT
    integer sums over the trailing frame (cnt, Σn, Σn²) — the same
    exact-moment contract as ``trend_fit``: the z-score is evaluated in
    doubles from identical integer inputs, so it is bit-stable under
    repartitioning and engine-identical.  Output: top-``k`` hours by
    ROUND(|z|, 6) with (group, hour) tie-break; hours with fewer than 2
    trailing observations are excluded.  The variance is FLOORED at 1.0
    (count-noise floor): a deviation from a perfectly constant baseline
    is the strongest anomaly, not an undefined one — without the floor
    the textbook z-score silently drops exactly the spikes a constant
    service rate makes most visible.

    At 100 TB the raw-event aggregation dominates and partial-aggs to
    (groups × hours) rows; the window runs over that reduced table,
    never the events.
    """
    hour = F.date_trunc("hour", F.col(ts_col)).alias("hour")
    hourly = (
        df.select(F.col(group_col).alias("grp"), hour)
        .groupBy("grp", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = (
        Window.partitionBy("grp")
        .orderBy(F.col("hour").asc())
        .rowsBetween(-trailing, -1)
    )
    stats = hourly.select(
        "grp",
        "hour",
        "n",
        F.count(F.lit(1)).over(w).cast("long").alias("m"),
        F.sum("n").over(w).cast("long").alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).cast("long").alias("s2"),
    ).filter(F.col("m") >= 2)
    mean = F.col("s1").cast("double") / F.col("m").cast("double")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double")
        / F.col("m").cast("double")
    ) / (F.col("m").cast("double") - F.lit(1.0))
    z = (F.col("n").cast("double") - mean) / F.sqrt(F.greatest(var, F.lit(1.0)))
    return (
        stats
        .select(
            F.col("grp").alias("event_type"),
            "hour",
            "n",
            (F.round(F.abs(z), 6) + F.lit(0.0)).alias("abs_z"),
        )
        .orderBy(F.col("abs_z").desc(), F.col("event_type").asc(), F.col("hour").asc())
        .limit(k)
    )


def quarantine_split(
    df: DataFrame,
    rules: list[tuple[str, Column]],
) -> tuple[DataFrame, DataFrame]:
    """Record-level data-quality gate with a dead-letter side: every
    row is checked against all ``rules`` (name, boolean Column —
    NULL counts as a failure, the ingest-safe reading) in ONE pass;
    rows passing everything go to the first frame, the rest to the
    second with a ``failed_rules`` column naming every violated rule —
    the quarantine/DLQ split every production loader puts in front of
    a 100 TB table so one malformed shard can't poison it.

    Scale shape: map-only — the rule vector is a single projection
    fused into the scan; both outputs share one source (no
    double-scan when the caller writes them in one job via
    ``persist`` or foreachBatch).

    → (valid_df, quarantined_df); quarantined rows carry
    ``failed_rules: array<string>`` in rule order.
    """
    checks = F.array(
        *[
            F.when(F.coalesce(cond, F.lit(False)), F.lit(None).cast("string"))
            .otherwise(F.lit(name))
            for name, cond in rules
        ]
    )
    flagged = df.withColumn(
        "failed_rules",
        F.filter(checks, lambda x: x.isNotNull()),
    )
    valid = flagged.filter(F.size("failed_rules") == 0).drop("failed_rules")
    bad = flagged.filter(F.size("failed_rules") > 0)
    return valid, bad

"""Event-sequence analytics: ordered funnels and cohort retention.

Beyond-reference operators (the reference has no event analytics at
all) in the family every large event store serves. Both are expressed
so the heavy input is shuffled a minimal number of times and all
per-row work stays in whole-stage codegen.

- **funnel_counts** — ordered-subsequence matching ("view, then click,
  then purchase — in that order"). Events are filtered to the step
  types FIRST (the funnel predicate is usually <1% of a 100 TB event
  table — this filter pushes to the scan), then ONE shuffle gathers
  each user's surviving events; the in-order match is a JVM
  ``aggregate`` fold over the time-sorted array, advancing a step
  cursor — no window, no per-step self-joins (k self-joins of the
  event table is the naive shape this replaces).
- **cohort_retention** — cohort = the user's first active week;
  retention[k] = users active k weeks after their cohort week. Three
  key-partitioned aggregations ((user, week) distinct → per-user min →
  per-(cohort, offset) count), each with map-side partial agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """→ (step, step_name, n_users): how many users completed the first
    ``k`` steps in order, for every k.

    Ordering is (ts, event_id) — the unique id tiebreaks equal
    timestamps, so the match is deterministic and engine-portable. A
    user's events are matched greedily: the cursor advances at the
    earliest event of the next step type that follows the previously
    matched event.
    """
    n_steps = len(steps)
    step_arr = F.array(*[F.lit(s) for s in steps])

    evs = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("_u"),
        F.struct(
            F.col(ts_col).alias("_ts"),
            F.col(id_col).alias("_eid"),
            F.col(type_col).alias("_t"),
        ).alias("_e"),
    )
    seq = evs.groupBy("_u").agg(F.array_sort(F.collect_list("_e")).alias("_seq"))
    reached = F.aggregate(
        "_seq",
        F.lit(0),
        lambda acc, e: F.when(
            (acc < n_steps) & (e["_t"] == F.element_at(step_arr, acc + 1)),
            acc + 1,
        ).otherwise(acc),
    )
    counts = (
        seq.select(reached.alias("_reached"))
        .filter(F.col("_reached") >= 1)
        .select(F.explode(F.sequence(F.lit(1), F.col("_reached"))).alias("step"))
        .groupBy("step")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    steps_df = events.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step int, step_name string"
    )
    return (
        steps_df.join(counts, "step", "left")
        .select(
            "step",
            "step_name",
            F.coalesce("n_users", F.lit(0)).alias("n_users"),
        )
        .orderBy("step")
    )


def cohort_retention(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """→ (cohort_week, week_offset, n_users, retention): for each
    weekly cohort (users whose first activity falls in that ISO week),
    how many are active ``week_offset`` weeks later, and the fraction
    of the cohort that represents (retention at offset 0 is 1.0 by
    construction)."""
    week = F.date_trunc("week", F.col(ts_col)).cast("date")
    user_weeks = events.select(
        F.col(user_col).alias("_u"), week.alias("_w")
    ).distinct()
    first = user_weeks.groupBy("_u").agg(F.min("_w").alias("cohort_week"))
    active = user_weeks.join(first, "_u").select(
        "cohort_week",
        (F.datediff(F.col("_w"), F.col("cohort_week")) / 7)
        .cast("int")
        .alias("week_offset"),
    )
    out = active.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    cohort_size = F.max(
        F.when(F.col("week_offset") == 0, F.col("n_users"))
    ).over(Window.partitionBy("cohort_week"))
    return out.select(
        # midnight timestamp rather than DATE: pandas/Arrow render both
        # as datetime64, so cross-engine comparisons see one type
        F.col("cohort_week").cast("timestamp").alias("cohort_week"),
        "week_offset",
        "n_users",
        F.round(F.col("n_users") / cohort_size, 6).alias("retention"),
    )


def gap_fill_hourly(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Time-series gap filling with last-observation-carried-forward
    (the hypertable ``time_bucket_gapfill`` + ``locf`` shape): roll the
    feed up to hourly buckets per key, densify each key's range with an
    hourly spine, and carry the last observed value across the gaps.

    → (key, bucket, is_gap, v_filled); the first buckets of a key are
    never gaps by construction (the spine starts at the key's first
    observation).

    Scale shape: the rollup is one keyed aggregate (map-side partial);
    the spine is generated from each key's (min, max) — a per-key
    ``sequence`` explode, no driver loop, no cross join against a
    global calendar (which would materialize keys × full range). The fill
    is a running ``last(ignorenulls)`` window over the same key
    partitioning. Dense-but-bounded: spine rows = Σ per-key span hours,
    the minimum any gap-filling semantics can produce.
    """
    hourly = (
        events.groupBy(
            F.col(key_col), F.date_trunc("hour", F.col(ts_col)).alias("bucket")
        )
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("v")
        )
    )
    spine = (
        hourly.groupBy(key_col)
        .agg(F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1"))
        .select(
            key_col,
            F.explode(
                F.sequence("_b0", "_b1", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, [key_col, "bucket"], "left")
        .select(
            key_col,
            "bucket",
            F.col("v").isNull().alias("is_gap"),
            F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        )
    )


def top_paths(
    events: DataFrame,
    n: int = 3,
    k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-k most frequent length-``n`` event-type paths ("view>cart>
    buy") across all users — the path-analysis staple.

    Shape: ONE shuffle (the per-user window, which a bucketed-by-user
    layout serves shuffle-free), ``n-1`` lead() columns over the same
    window frame (a single Window node — Spark evaluates all leads in
    one pass), then a partially-aggregated global count and a
    TakeOrderedAndProject top-k: no self-joins, no explode, per-row
    work in codegen.  Ties break on the path string for deterministic,
    engine-stable output.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)
    ]
    path = F.concat_ws(">", *steps)
    complete = F.lead(type_col, n - 1).over(w).isNotNull()
    return (
        events.select(path.alias("path"), complete.alias("_ok"))
        .filter(F.col("_ok"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(k)
    )


def cooccurring_pairs(
    events: DataFrame,
    min_support: int = 2,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Event-type pairs co-occurring for at least ``min_support``
    users (frequent-itemset mining at itemset size 2 — the
    market-basket staple).

    Shape: reduce FIRST to the distinct (user, type) table — bounded
    by users × type-vocabulary, far smaller than the event log — then
    a self-equi-join on ``user_col`` with ``a < b`` ordering
    (each pair counted once), then a partially-aggregated pair count.
    The join fan-out per user is (distinct types)² — bounded by the
    type vocabulary, NOT by the user's event count, which is what
    makes this safe where a raw-event self-join is not.
    """
    ut = events.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("t")
    ).distinct()
    a = ut.withColumnRenamed("t", "item_a")
    b = ut.withColumnRenamed("t", "item_b")
    return (
        a.join(b, "u")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .filter(F.col("n_users") >= min_support)
    )


def seasonal_decompose_hourly(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    period: int = 24,
    half_window: int = 12,
) -> DataFrame:
    """Classical additive seasonal decomposition of the per-type hourly
    event-count series: ``y = trend + seasonal + residual`` with a
    centered moving-average trend (window ``2·half_window + 1`` rows)
    and hour-of-day seasonal means of the detrended series — the
    moving-average step of STL / statsmodels' seasonal_decompose,
    kept exactly replayable.

    Determinism contract: only interior rows with a FULL trend window
    survive (count == 2·half_window + 1), so every mean is an exact
    integer sum divided once — trend = Σ_window y / W, and the seasonal
    mean needs no double accumulation: Σ_group detrended =
    Σ_group y − (Σ_group Σ_window y) / W, i.e. two long sums and one
    division. Both engines evaluate the identical expression trees, so
    values match bit-for-bit before the 6 dp floor-half-up rounding.

    Scale shape: the hourly rollup collapses events to ≤ types·hours
    rows before anything else; the trend window is ONE shuffle on
    (type) ordered by hour; the seasonal means are a tiny
    (type × period) aggregate broadcast back. At 100 TB the rollup is
    the only stage that sees the raw table.

    → (event_type, bucket, y, trend, seasonal, residual) for interior
    hours, ordered by (event_type, bucket).
    """
    from pyspark.sql import Window

    w_len = 2 * half_window + 1
    hourly = (
        events.groupBy(
            F.col(type_col).alias("event_type"),
            F.date_trunc("hour", F.col(ts_col)).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-half_window, half_window)
    )
    trended = (
        hourly.withColumn("_sw", F.sum("y").over(w))
        .withColumn("_cw", F.count(F.lit(1)).over(w))
        .filter(F.col("_cw") == w_len)
        .drop("_cw")
    )
    trended = trended.withColumn("_hod", F.hour("bucket"))
    seas = (
        trended.groupBy("event_type", "_hod")
        .agg(
            F.sum("y").alias("_sy"),
            F.sum("_sw").alias("_ssw"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            "event_type",
            "_hod",
            (
                (
                    F.col("_sy").cast("double")
                    - F.col("_ssw").cast("double") / F.lit(float(w_len))
                )
                / F.col("_n").cast("double")
            ).alias("_seasonal"),
        )
    )
    r6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    trend = F.col("_sw").cast("double") / F.lit(float(w_len))
    resid = F.col("y").cast("double") - trend - F.col("_seasonal")
    return (
        trended.join(F.broadcast(seas), ["event_type", "_hod"])
        .select(
            "event_type",
            "bucket",
            "y",
            r6(trend).alias("trend"),
            r6(F.col("_seasonal")).alias("seasonal"),
            r6(resid).alias("residual"),
        )
        .orderBy("event_type", "bucket")
    )


def last_touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    source_types: tuple[str, ...] = ("view", "click"),
    lookback_hours: int = 24,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Last-touch marketing attribution: each conversion is credited to
    the user's most recent source event (view/click) at or before the
    conversion, within a lookback window — the classic funnel-credit
    query, expressed as ONE union + window instead of a per-conversion
    self-join.

    Scale shape: sources and conversions are unioned with a side tag
    and shuffled ONCE on the user key; a running
    ``last(source, ignorenulls)`` over (ts, side, id) carries the
    latest source forward to each conversion row. The ordering makes
    ties total: an equal-timestamp source sorts BEFORE the conversion
    (>= as-of semantics), and equal-timestamp sources resolve by
    event id — so the credited source is engine-independent, which is
    what lets the DuckDB oracle replay it value-for-value. Sources
    older than the lookback are nulled AFTER the carry (the window
    never needs range logic).

    → (conversion_id, user_id, conversion_ts, source_id, source_type,
    lag_sec) — one row per conversion; unattributed rows keep NULL
    source columns.
    """
    from pyspark.sql import Window

    src = events.filter(F.col(type_col).isin(*source_types)).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(id_col).alias("_id"),
        F.struct(
            F.col(id_col).alias("sid"),
            F.col(type_col).alias("stype"),
            F.col(ts_col).alias("sts"),
        ).alias("_src"),
    )
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_t"),
        F.lit(1).alias("_side"),
        F.col(id_col).alias("_id"),
        F.lit(None)
        .cast("struct<sid:bigint,stype:string,sts:timestamp>")
        .alias("_src"),
    )
    w = (
        Window.partitionBy("_u")
        .orderBy("_t", "_side", "_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        src.unionByName(conv)
        .withColumn("_last", F.last("_src", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    in_window = F.col("_last.sts") >= (
        F.col("_t") - F.expr(f"INTERVAL {int(lookback_hours)} HOURS")
    )
    keep = F.col("_last").isNotNull() & in_window
    return carried.select(
        F.col("_id").alias("conversion_id"),
        F.col("_u").alias(user_col),
        F.col("_t").alias("conversion_ts"),
        F.when(keep, F.col("_last.sid")).alias("source_id"),
        F.when(keep, F.col("_last.stype")).alias("source_type"),
        # exact integer µs diff floor-divided to seconds: Spark's
        # unix_timestamp TRUNCATES sub-second parts while DuckDB's
        # epoch() CAST rounds — µs arithmetic sidesteps both
        F.when(
            keep,
            F.expr("(unix_micros(_t) - unix_micros(_last.sts)) div 1000000"),
        ).alias("lag_sec"),
    )


def linear_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    source_types: tuple[str, ...] = ("view", "click"),
    lookback_hours: int = 24,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Multi-touch (linear) attribution: every source event in the
    conversion's lookback window shares the credit equally (1/n) —
    last-touch's sibling, composed from the granule range join
    (operators/rangejoin.py point_in_interval_join): sources are the
    points, each conversion is the interval [t − lookback, t].

    Scale shape: the range join is ONE equi-shuffle on (user, granule)
    — ~lookback/granule interval rows per conversion; the per-
    conversion source count is one window over the (small) join
    output; credit is a single division (exactly replayable).
    Conversions with no source in window survive via the left
    join-back with NULL source columns and n_sources = 0.

    → (conversion_id, user_id, conversion_ts, source_id, source_type,
    n_sources, credit) — one row per (conversion, source), or one
    NULL-source row for unattributed conversions.
    """
    from pyspark.sql import Window

    from stac_fastapi_duckdb_spark.operators.rangejoin import (
        point_in_interval_join,
    )

    pts = events.filter(F.col(type_col).isin(*source_types)).select(
        F.col(user_col),
        F.col(ts_col).alias("_sts"),
        F.col(id_col).alias("source_id"),
        F.col(type_col).alias("source_type"),
    )
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col),
        F.col(id_col).alias("conversion_id"),
        F.col(ts_col).alias("conversion_ts"),
        (F.col(ts_col) - F.expr(f"INTERVAL {int(lookback_hours)} HOURS")).alias(
            "_w0"
        ),
        F.col(ts_col).alias("_w1"),
    )
    # granule = the (fixed) lookback width: every interval explodes to
    # exactly 2 granule rows instead of lookback/granule+1 — the
    # "granule ≈ interval length" tuning rule from rangejoin.py (the
    # 3600 s default under 24 h windows was a 25× interval blowup)
    pairs = point_in_interval_join(
        pts, conv, "_sts", "_w0", "_w1", on=user_col,
        granule_seconds=int(lookback_hours) * 3600,
    ).select(user_col, "conversion_id", "conversion_ts", "source_id", "source_type")
    n = F.count(F.lit(1)).over(Window.partitionBy("conversion_id"))
    credited = pairs.select(
        user_col,
        "conversion_id",
        "conversion_ts",
        "source_id",
        "source_type",
        n.cast("bigint").alias("n_sources"),
        (F.lit(1.0) / n).alias("credit"),
    )
    missing = (
        conv.join(
            credited.select("conversion_id").distinct(),
            "conversion_id",
            "left_anti",
        )
        .select(
            user_col,
            "conversion_id",
            "conversion_ts",
            F.lit(None).cast("bigint").alias("source_id"),
            F.lit(None).cast("string").alias("source_type"),
            F.lit(0).cast("bigint").alias("n_sources"),
            F.lit(None).cast("double").alias("credit"),
        )
    )
    return credited.unionByName(missing)

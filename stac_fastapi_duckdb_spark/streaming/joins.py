"""Watermarked stream-stream joins.

The classic attribution shape: join each "view" event to the same
user's "purchase" events that follow within a bounded interval. In
Structured Streaming this is an interval join — both sides carry a
watermark, and the join condition bounds event time on both sides so
the state store can expire rows once the watermark passes the interval
(state is O(events in the interval window), not O(stream) — the
property that makes the operator viable on an unbounded 100 TB/day
stream).

Batch and streaming share the SAME join builder: the batch form is the
correctness oracle for the streaming form (the driver's DuckDB SQL
restates the batch join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_purchase_pairs(
    views: DataFrame,
    purchases: DataFrame,
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user view→purchase attribution pairs: purchase strictly
    after the view and within ``within``. Works on batch AND streaming
    inputs (if streaming, both sides get event-time watermarks so the
    interval-join state can expire).

    One equi-shuffle on user_id; the time bound is evaluated inside the
    joined partitions (stream-stream interval join / batch sort-merge
    with a residual range predicate).
    """
    if views.isStreaming:
        views = views.withWatermark("ts", watermark)
    if purchases.isStreaming:
        purchases = purchases.withWatermark("ts", watermark)
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    cond = (
        (v["user_id"] == p["p_user"])
        & (p["purchase_ts"] > v["view_ts"])
        & (p["purchase_ts"] <= v["view_ts"] + F.expr(f"INTERVAL {within}"))
    )
    return v.join(p, cond, "inner").select(
        "user_id", "view_id", "purchase_id", "view_ts", "purchase_ts"
    )


def split_by_type(events: DataFrame, *types: str) -> tuple[DataFrame, ...]:
    """Filter one event feed into per-type feeds (filters are pushed to
    the scan / applied before any state is built)."""
    return tuple(events.filter(F.col("event_type") == t) for t in types)


def enrich_with_dim(
    events: DataFrame,
    dim: DataFrame,
    on: tuple[str, str],
    dim_cols: list[str],
) -> DataFrame:
    """Stream-static broadcast enrichment: join an (unbounded) event
    feed to a small static dimension table. The dim side is broadcast —
    stateless per micro-batch, no state store, no watermark needed, and
    the stream side is never shuffled. The standard 'decorate the fact
    stream' topology: at 100 TB/day the fact side stays a pass-through
    map while the dimension (thousands-to-millions of rows) ships to
    executors once per batch."""
    ev_key, dim_key = on
    d = dim.select(F.col(dim_key), *[F.col(c) for c in dim_cols])
    return events.join(
        F.broadcast(d), events[ev_key] == d[dim_key], "inner"
    ).drop(dim_key)


def enriched_hourly_value(
    events: DataFrame,
    dim: DataFrame,
    on: tuple[str, str],
    group_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked hourly rollup of event value per dimension attribute
    (e.g. revenue per customer segment per hour): broadcast-enrich the
    stream, then tumbling-window aggregate. Works identically on batch
    input (the oracle contract)."""
    enriched = enrich_with_dim(events, dim, on, [group_col])
    if enriched.isStreaming:
        enriched = enriched.withWatermark("ts", watermark)
    return (
        enriched.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col(group_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # DECIMAL sum: exact and order-independent under arbitrary
            # merge order (stream replay / partial-agg merges)
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket"),
            group_col,
            "n_events",
            "total_value",
        )
    )

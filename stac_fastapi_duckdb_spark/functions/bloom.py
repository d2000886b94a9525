"""Join-pruning helpers: runtime bloom filters + exact semi-join
reduction.

At 100 TB the dominant join cost is shuffling probe-side rows that can
never match. Two complementary reducers:

- **Runtime bloom filter** (``enable_runtime_bloom``): Catalyst's
  InjectRuntimeFilter rule builds a bloom filter from the filtered
  build side (``bloom_filter_agg``) and evaluates ``might_contain``
  against the probe side BEFORE its shuffle — rows failing the filter
  are dropped pre-exchange. This is the idiomatic Spark path (the
  engine already owns it); the library's job is to configure it
  honestly and make it observable. False positives only → join result
  is EXACTLY unchanged.
- **Exact semi-join reduction** (``semi_reduce``): when the build
  side's distinct keyset is broadcastable, a LeftSemi broadcast join
  prunes the probe side with zero false positives and zero shuffle of
  the probe. Use for star joins where the dim filter is selective;
  prefer runtime bloom when the keyset itself is too big to broadcast.

Local caveat: Spark only injects the bloom filter when the probe side
looks expensive (``applicationSideScanSizeThreshold``, default 10GB) —
at test scale we lower it to observe the rewrite; at cluster scale the
defaults are already right.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CONFS = {
    "enabled": "spark.sql.optimizer.runtime.bloomFilter.enabled",
    "creation_max": "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
    "application_min": (
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    ),
    "expected_items": "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems",
    "max_bits": "spark.sql.optimizer.runtime.bloomFilter.numBits",
}


def enable_runtime_bloom(
    spark: SparkSession,
    creation_side_max: str = "10MB",
    application_side_min: str = "10GB",
    expected_items: int | None = None,
) -> dict[str, str | None]:
    """Turn on Catalyst's runtime bloom-filter join pruning with
    explicit thresholds. Returns the previous values so callers can
    restore them (``restore_confs``)."""
    prev: dict[str, str | None] = {}
    sets = {
        _CONFS["enabled"]: "true",
        _CONFS["creation_max"]: creation_side_max,
        _CONFS["application_min"]: application_side_min,
    }
    if expected_items is not None:
        sets[_CONFS["expected_items"]] = str(expected_items)
    for key, val in sets.items():
        try:
            prev[key] = spark.conf.get(key)
        except Exception:
            prev[key] = None
        spark.conf.set(key, val)
    return prev


def restore_confs(spark: SparkSession, prev: dict[str, str | None]) -> None:
    for key, val in prev.items():
        if val is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, val)


def bloom_filter_injected(df: DataFrame) -> bool:
    """True when Catalyst injected a runtime bloom filter into this
    plan (``bloom_filter_agg`` on the build side, ``might_contain`` on
    the probe side). Diagnostic: assert your big joins actually get the
    pruning you think they do."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return "bloom_filter_agg" in plan


def freeze_plan(df: DataFrame) -> DataFrame:
    """Force plan compilation NOW, under the session confs currently in
    effect. QueryExecution caches its optimized/physical plan, so the
    returned DataFrame keeps this plan even after the confs are
    restored — lets a query opt into planner settings (e.g. runtime
    bloom + no auto-broadcast) without leaking them into the session."""
    df._jdf.queryExecution().executedPlan()
    return df


def semi_reduce(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    broadcast_keys: bool = True,
) -> DataFrame:
    """Prune ``probe`` to rows whose key appears in ``build`` — an
    exact (no-false-positive) LeftSemi reduction applied BEFORE the
    expensive join/shuffle. ``build``'s distinct keys are broadcast by
    default (correct when the filtered dim keyset is ≪ probe; for a
    huge keyset use runtime bloom instead)."""
    keys = build.select(F.col(build_key).alias("__sr_key")).distinct()
    if broadcast_keys:
        keys = F.broadcast(keys)
    return probe.join(
        keys, probe[probe_key] == keys["__sr_key"], "left_semi"
    )

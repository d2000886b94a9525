"""operators/cdc.py: SCD2 interval building + latest-wins CDC apply."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.operators.cdc import (
    apply_cdc,
    latest_changes,
    scd2_from_changelog,
)


def _ts(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day)


def test_scd2_suppresses_consecutive_duplicates_and_builds_intervals(spark):
    log = spark.createDataFrame(
        [
            (1, _ts(1), 1, "bronze"),
            (1, _ts(2), 2, "bronze"),  # unchanged → suppressed
            (1, _ts(3), 3, "gold"),
            (1, _ts(4), 4, "bronze"),  # back to a previous value → NEW row
            (2, _ts(5), 5, "silver"),
        ],
        "key int, ts timestamp, seq int, tier string",
    )
    rows = {
        (r.key, r.tier, r.valid_from): (r.valid_to, r.is_current)
        for r in scd2_from_changelog(log, ["key"], "ts", ["tier"], ["seq"]).collect()
    }
    assert rows[(1, "bronze", _ts(1))] == (_ts(3), False)
    assert rows[(1, "gold", _ts(3))] == (_ts(4), False)
    assert rows[(1, "bronze", _ts(4))] == (None, True)
    assert rows[(2, "silver", _ts(5))] == (None, True)
    assert len(rows) == 4


def test_latest_changes_breaks_timestamp_ties_deterministically(spark):
    ch = spark.createDataFrame(
        [(1, _ts(1), 1, "a"), (1, _ts(1), 2, "b")],
        "key int, ts timestamp, seq int, v string",
    )
    out = latest_changes(ch, ["key"], "ts", ["seq"]).collect()
    assert len(out) == 1 and out[0].v == "b"  # higher tiebreak wins


def test_apply_cdc_upsert_delete_insert_passthrough(spark):
    snap = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0), (3, "carol", 30.0)],
        "key int, name string, bal double",
    )
    ch = spark.createDataFrame(
        [
            (1, "U", 11.0, _ts(1), 1),
            (1, "U", 12.0, _ts(2), 2),  # later wins
            (2, "D", 0.0, _ts(1), 3),
            (9, "U", 99.0, _ts(1), 4),  # insert of a new key
        ],
        "key int, op string, bal double, ts timestamp, seq int",
    )
    out = {
        r.key: (r.name, r.bal)
        for r in apply_cdc(
            snap, ch, ["key"], "op", "ts", ["bal"], ["seq"]
        ).collect()
    }
    assert out[1] == ("alice", 12.0)  # upsert, passthrough name kept
    assert 2 not in out  # deleted
    assert out[3] == ("carol", 30.0)  # untouched
    assert out[9] == (None, 99.0)  # inserted; non-set cols NULL
    assert len(out) == 3


def test_scd2_single_window_shuffle(spark):
    log = spark.createDataFrame(
        [(1, _ts(1), 1, "x")], "key int, ts timestamp, seq int, v string"
    )
    plan = (
        scd2_from_changelog(log, ["key"], "ts", ["v"], ["seq"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # change-detection lag and interval lead share one partitioning:
    # exactly one Exchange despite two Window nodes
    assert plan.count("Exchange") == 1


def test_scd2_extend_equals_full_rebuild(spark):
    full_log = [
        (1, _ts(1), 1, "bronze"),
        (1, _ts(3), 2, "gold"),
        (2, _ts(2), 3, "silver"),
        (3, _ts(2), 4, "bronze"),
        # ---- batch boundary ----
        (1, _ts(5), 5, "bronze"),
        (2, _ts(6), 6, "silver"),  # unchanged value → suppressed
        (4, _ts(6), 7, "gold"),    # brand-new key
    ]
    schema = "key int, ts timestamp, seq int, tier string"
    log1 = spark.createDataFrame(full_log[:4], schema)
    log2 = spark.createDataFrame(full_log[4:], schema)
    both = spark.createDataFrame(full_log, schema)

    from stac_fastapi_duckdb_spark.operators.cdc import scd2_extend

    dim1 = scd2_from_changelog(log1, ["key"], "ts", ["tier"], ["seq"])
    extended = scd2_extend(dim1, log2, ["key"], "ts", ["tier"], ["seq"])
    rebuilt = scd2_from_changelog(both, ["key"], "ts", ["tier"], ["seq"])

    key = lambda r: (r.key, r.tier, r.valid_from, r.valid_to, r.is_current)
    assert sorted(map(key, extended.collect())) == sorted(
        map(key, rebuilt.collect())
    )
    # untouched key 3 passed through; suppressed same-value change for
    # key 2 left its interval open
    rows = {(r.key, r.is_current): r for r in extended.collect()}
    assert rows[(3, True)].tier == "bronze"
    assert rows[(2, True)].valid_from == _ts(2)


def test_scd2_keeps_first_row_when_all_attrs_null(spark):
    # first-row change detection must not rely on attribute comparison:
    # lag(attr) eqNullSafe attr is NULL<=>NULL = true when the key's
    # first row has all-NULL attrs, which would drop its initial interval
    log = spark.createDataFrame(
        [(1, _ts(1), None), (1, _ts(2), "gold"), (2, _ts(3), None)],
        "key int, ts timestamp, tier string",
    )
    rows = {
        (r.key, r.tier, r.valid_from): (r.valid_to, r.is_current)
        for r in scd2_from_changelog(log, ["key"], "ts", ["tier"]).collect()
    }
    assert rows[(1, None, _ts(1))] == (_ts(2), False)
    assert rows[(1, "gold", _ts(2))] == (None, True)
    assert rows[(2, None, _ts(3))] == (None, True)
    assert len(rows) == 3


def test_scd2_extend_non_long_tiebreak_column(spark):
    # the synthetic placeholder for tiebreak columns must take each
    # column's actual dtype (string here) — a hardcoded long cast breaks
    # or mis-coerces the replay union
    from stac_fastapi_duckdb_spark.operators.cdc import scd2_extend

    schema = "key int, ts timestamp, src string, tier string"
    hist = spark.createDataFrame(
        [(1, _ts(1), "a", "bronze"), (1, _ts(3), "b", "gold")], schema
    )
    dim = scd2_from_changelog(hist, ["key"], "ts", ["tier"], ["src"])
    batch = spark.createDataFrame([(1, _ts(5), "c", "silver")], schema)
    out = scd2_extend(dim, batch, ["key"], "ts", ["tier"], ["src"])
    rows = {
        (r.tier, r.valid_from): (r.valid_to, r.is_current) for r in out.collect()
    }
    assert rows[("bronze", _ts(1))] == (_ts(3), False)
    assert rows[("gold", _ts(3))] == (_ts(5), False)
    assert rows[("silver", _ts(5))] == (None, True)


def test_snapshot_as_of_covering_intervals(spark):
    from stac_fastapi_duckdb_spark.operators.cdc import snapshot_as_of

    log = spark.createDataFrame(
        [
            (1, _ts(1), 1, "bronze"),
            (1, _ts(3), 2, "gold"),
            (2, _ts(5), 3, "silver"),  # born after the as-of instant
            (3, _ts(2), 4, "iron"),
        ],
        "key int, ts timestamp, seq int, tier string",
    )
    dim = scd2_from_changelog(log, ["key"], "ts", ["tier"], ["seq"])
    snap = {
        (r.key): r.tier
        for r in snapshot_as_of(dim, _ts(3)).collect()
    }
    # as-of day 3: key 1 just flipped to gold (valid_from <= ts is
    # inclusive), key 2 doesn't exist yet, key 3 is iron
    assert snap == {1: "gold", 3: "iron"}
    # is_current is dropped — a historical snapshot has no "current"
    cols = snapshot_as_of(dim, _ts(3)).columns
    assert "is_current" not in cols


def test_snapshot_as_of_boundary_is_half_open(spark):
    from stac_fastapi_duckdb_spark.operators.cdc import snapshot_as_of

    log = spark.createDataFrame(
        [(1, _ts(1), 1, "a"), (1, _ts(2), 2, "b")],
        "key int, ts timestamp, seq int, tier string",
    )
    dim = scd2_from_changelog(log, ["key"], "ts", ["tier"], ["seq"])
    # exactly at the flip instant the NEW value holds ([from, to))
    assert snapshot_as_of(dim, _ts(2)).collect()[0].tier == "b"

"""Change-data-capture operators: SCD2 interval building and
latest-wins CDC apply.

The reference has no write/merge path at all (every transaction method
is a ``pass`` stub — reference ``stac_fastapi/duckdb/database_logic.py:
1026-1187``); a 100 TB training-data warehouse needs one. These are the
two halves of a batch CDC pipeline:

- ``scd2_from_changelog``: an append-only change log (key, ts, attrs)
  → type-2 slowly-changing dimension rows ``[valid_from, valid_to)``
  with consecutive-duplicate suppression. Pure window functions: ONE
  shuffle on the key, no self-joins, no driver iteration — the classic
  MERGE-per-day approach rescans the dimension daily; this rebuilds (or
  with a date filter, incrementally extends) it in a single pass.
- ``latest_changes`` / ``apply_cdc``: compact a CDC feed to its final
  state per key (row_number window — NOT groupBy-max + self-join, which
  would shuffle twice and break ties wrongly on duplicate timestamps),
  then merge into a snapshot with one full-outer join: upserts replace,
  deletes drop, untouched rows pass through. At scale the compacted
  change set is usually ≪ snapshot, so Spark broadcasts it under AQE.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_spec(ts_col: str, tiebreak_cols: list[str]) -> list[Column]:
    return [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]


def scd2_from_changelog(
    changelog: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Build SCD2 rows from an append-only change log.

    Rows where no attribute changed versus the previous row of the same
    key are suppressed; each surviving row becomes an interval
    ``[valid_from, valid_to)`` where ``valid_to`` is the next change's
    timestamp (NULL for the current row, flagged ``is_current``).

    Two window functions over the same (key, order) spec → Catalyst
    evaluates both in one Window node after one shuffle.
    """
    tiebreak_cols = tiebreak_cols or []
    w = Window.partitionBy(*key_cols).orderBy(*_order_spec(ts_col, tiebreak_cols))
    # A key's FIRST row is always a change — detected via lag(ts) being
    # NULL, not via attribute comparison: when every attr value of the
    # first row is itself NULL, ``lag(attr) eqNullSafe attr`` is
    # NULL<=>NULL = true and the attr test alone would silently drop the
    # key's initial interval.
    first_row = F.lag(F.col(ts_col)).over(w).isNull()
    changed = reduce(
        lambda a, b: a | b,
        [first_row]
        + [
            # null-safe "differs from previous"
            ~F.lag(F.col(c)).over(w).eqNullSafe(F.col(c))
            for c in attr_cols
        ],
    )
    kept = changelog.select(
        *key_cols, ts_col, *tiebreak_cols, *attr_cols
    ).withColumn("_chg", changed).filter(F.col("_chg")).drop("_chg")
    w2 = Window.partitionBy(*key_cols).orderBy(*_order_spec(ts_col, tiebreak_cols))
    return (
        kept.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(*key_cols, *attr_cols, "valid_from", "valid_to", "is_current")
    )


def scd2_extend(
    dim: DataFrame,
    new_changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Incrementally extend an SCD2 dimension with a new changelog
    batch — the at-scale alternative to rebuilding from the full
    history (a day's changes touch a tiny fraction of keys; the rest of
    the dimension passes through untouched).

    Mechanics: keys present in the batch are re-derived by replaying
    (their current open row as a synthetic change) ⊎ (their new
    changes) through ``scd2_from_changelog``; closed rows and untouched
    keys pass through. Equivalent to a full rebuild whenever the batch
    is strictly newer than each touched key's ``valid_from`` (enforced
    by construction in an append-only ingest).

    Plan shape: one semi/anti split of the dimension on the (small)
    batch keyset — broadcastable — plus one window shuffle over ONLY
    the touched keys' rows.
    """
    tiebreak_cols = tiebreak_cols or []
    batch_keys = new_changes.select(*key_cols).distinct()
    cond = reduce(
        lambda a, b: a & b, [dim[k] == batch_keys[k] for k in key_cols]
    )
    untouched = dim.join(F.broadcast(batch_keys), cond, "left_anti")
    touched = dim.join(F.broadcast(batch_keys), cond, "left_semi")
    # a touched key's still-closed history is final; only its open row
    # participates in the replay (its valid_from is the state's ts)
    closed = touched.filter(~F.col("is_current"))
    # synthetic tiebreak placeholders take each column's ACTUAL dtype
    # from the batch schema — a hardcoded cast would break the
    # unionByName (or coerce) for string/timestamp tiebreak columns
    tb_types = {c: new_changes.schema[c].dataType for c in tiebreak_cols}
    open_rows = touched.filter(F.col("is_current")).select(
        *key_cols,
        F.col("valid_from").alias(ts_col),
        *[F.lit(None).cast(tb_types[c]).alias(c) for c in tiebreak_cols],
        *attr_cols,
    )
    replay = open_rows.unionByName(
        new_changes.select(*key_cols, ts_col, *tiebreak_cols, *attr_cols),
        allowMissingColumns=False,
    )
    rebuilt = scd2_from_changelog(
        replay, key_cols, ts_col, attr_cols, tiebreak_cols
    )
    return untouched.unionByName(closed).unionByName(rebuilt)


def latest_changes(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Compact a CDC feed to the winning (latest) change per key.
    row_number over a descending (ts, tiebreaks) window — deterministic
    under duplicate timestamps, one shuffle."""
    tiebreak_cols = tiebreak_cols or []
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc(), *[F.col(c).desc() for c in tiebreak_cols]
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str,
    ts_col: str,
    set_cols: list[str],
    tiebreak_cols: list[str] | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Merge a CDC feed into a snapshot (batch MERGE emulation).

    Latest change per key wins; ``delete_op`` rows drop the key,
    anything else upserts ``set_cols`` (insert if the key is new, the
    remaining snapshot columns NULL). Untouched snapshot rows pass
    through. One window shuffle + one full-outer join.
    """
    win = latest_changes(changes, key_cols, ts_col, tiebreak_cols).select(
        *[F.col(c).alias(f"_c_{c}") for c in key_cols],
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"_n_{c}") for c in set_cols],
    )
    cond = reduce(
        lambda a, b: a & b,
        [snapshot[k] == win[f"_c_{k}"] for k in key_cols],
    )
    merged = snapshot.join(win, cond, "full_outer").filter(
        F.col("_op").isNull() | (F.col("_op") != delete_op)
    )
    out_key = [
        F.coalesce(snapshot[k], F.col(f"_c_{k}")).alias(k) for k in key_cols
    ]
    passthrough = [
        c for c in snapshot.columns if c not in key_cols and c not in set_cols
    ]
    out_set = [
        F.when(F.col("_op").isNotNull(), F.col(f"_n_{c}"))
        .otherwise(snapshot[c])
        .alias(c)
        for c in set_cols
    ]
    return merged.select(*out_key, *[snapshot[c] for c in passthrough], *out_set)


def snapshot_as_of(
    scd2: DataFrame,
    ts,
    ts_col_from: str = "valid_from",
    ts_col_to: str = "valid_to",
) -> DataFrame:
    """Time-travel read over an SCD2 dimension: the state of every key
    at instant ``ts`` — rows whose ``[valid_from, valid_to)`` interval
    covers it (open ``valid_to`` = still current).

    This is a pure partition-local filter over the interval table: no
    shuffle, and with the dimension stored partitioned/clustered on
    ``valid_from`` the predicate prunes files (min/max footer stats) —
    the Iceberg/Delta time-travel access pattern re-expressed over an
    explicit interval table. Keys born after ``ts`` simply have no
    covering interval and drop out, matching a historical snapshot.
    """
    t = F.lit(ts).cast("timestamp")
    return scd2.filter(
        (F.col(ts_col_from) <= t)
        & (F.col(ts_col_to).isNull() | (F.col(ts_col_to) > t))
    ).drop("is_current")

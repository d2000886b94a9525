"""Custom stateful streaming operator: sessionization via
``applyInPandasWithState``.

``F.session_window`` (streaming/events.py) covers plain gap sessions;
this operator is the EXTENSIBLE shape — arbitrary per-key state machines
(funnels, fraud windows, CDC reconciliation) that built-in windows can't
express. Semantics implemented here match gap sessions exactly so the
batch gaps-and-islands SQL stays the oracle.

Emission contract (append mode, event-time timeout):

- A session is CLOSED and emitted as soon as a later event for the same
  key proves the gap elapsed (arrives > gap after the session's last
  event) — no watermark wait needed for interior sessions.
- Each key's final open session sits in state with an event-time timeout
  at last_ts + gap; it emits when the watermark passes that point. On a
  finite replay with watermark delay 0 the watermark ends at max(ts), so
  the deterministic output is: every session except each key's last one
  if that one's (last_ts + gap) > max(ts) over the input.

State per key is ONE open session (start, last, n, sum) — constant-size
state regardless of history length, the property that keeps a 100 TB /
unbounded stream's state store flat.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

# open-session accumulator: timestamps as epoch micros (state schema
# must be Spark-SQL encodable; longs are the stable choice)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

_US = 1_000_000


def _sessionize_fn(gap_us: int):
    def fn(
        key: tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, float]] = []

        if state.hasTimedOut:
            # watermark passed last_ts + gap: the open session is final
            start_us, last_us, n, sv = state.get
            closed.append((start_us, last_us, n, sv))
            state.remove()
        else:
            cur = list(state.get) if state.exists else None
            rows = pd.concat(list(pdf_iter), ignore_index=True)
            rows = rows.sort_values("ts")
            for ts, value in zip(rows["ts"], rows["value"]):
                ts_us = int(ts.value // 1000)  # pandas ns → µs
                v = float(value) if value == value else 0.0
                if cur is None:
                    cur = [ts_us, ts_us, 1, v]
                elif ts_us - cur[1] > gap_us:
                    closed.append(tuple(cur))
                    cur = [ts_us, ts_us, 1, v]
                else:
                    cur[1] = max(cur[1], ts_us)
                    cur[2] += 1
                    cur[3] += v
            if cur is not None:
                state.update(tuple(cur))
                # event-time timeout: fire when watermark ≥ last + gap
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _, _ in closed
                    ],
                    "session_end": [
                        pd.Timestamp(l + gap_us, unit="us")
                        for _, l, _, _ in closed
                    ],
                    "n_events": [n for _, _, n, _ in closed],
                    "sum_value": [sv for _, _, _, sv in closed],
                }
            )

    return fn


def stateful_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "0 seconds",
    key: str = "user_id",
) -> DataFrame:
    """Gap-sessionization as a per-key state machine (streaming input
    required). Sum here is float (state-schema simplicity); the
    session_window operator keeps the DECIMAL-exact path."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(key)
        .applyInPandasWithState(
            _sessionize_fn(gap_minutes * 60 * _US),
            SESSION_OUTPUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )

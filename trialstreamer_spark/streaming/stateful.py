"""Custom stateful streaming operators (SURVEY §2.9 north-star: the
reference has no sessionization — its "stream" is daily file CDC — but a
living-database engine at scale needs event-time state).

``sessionize_stream`` is gap-based session windowing as an
``applyInPandasWithState`` operator:

- group by user, event-time timeout;
- a session absorbs events while the gap to the previous event is ≤ the
  threshold; a larger gap closes the open session (emitted) and opens a
  new one;
- the open session is flushed when the WATERMARK passes its
  last-event-time + gap (event-time timeout), giving deterministic
  results for any arrival pattern within the watermark bound.

Scale shape: state is one small tuple per active user key, partitioned
by the groupBy hash — the same partitioning the shuffle already did, so
adding state costs no extra exchange. The batch analog (for replay /
backfill parity) is plans.relational.sessionize, which computes the same
sessions with a lag-window over a static table.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
    ]
)

# (session_start_us, last_ts_us, n_events)
SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", IntegerType()),
    ]
)

_US = 1_000_000


def _session_fn(gap_us: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []

        if state.hasTimedOut:
            if state.exists:
                closed.append(tuple(state.get))
                state.remove()
        else:
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us = last_us = n = None
            ts_us = sorted(
                int(t.value // 1000)  # pandas ns → µs
                for pdf in pdfs
                for t in pd.to_datetime(pdf["ts"])
            )
            for t in ts_us:
                if start_us is None:
                    start_us, last_us, n = t, t, 1
                elif t - last_us <= gap_us:
                    last_us, n = max(last_us, t), n + 1
                else:
                    closed.append((start_us, last_us, n))
                    start_us, last_us, n = t, t, 1
            if start_us is not None:
                state.update((start_us, last_us, n))
                state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _ in closed
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="us") for _, e, _ in closed
                    ],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """events(user_id, ts, ...) stream → closed sessions. Emits a session
    when a larger-than-gap event arrives for the user (in-batch close) or
    when the watermark passes the open session's expiry (timeout close).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes * 60 * _US),
            SESSION_OUTPUT,
            SESSION_STATE,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup (the streaming analog of the keep-last
    batch dedupe F14, and the ingestion guard a continuous training-data
    feed needs): drop re-deliveries of the same key arriving within the
    watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps state only until the
    watermark passes each key's last-seen time + delay, so state is
    bounded by (arrival rate x delay) — a plain ``dropDuplicates`` on a
    stream would grow state forever. Keys default to the natural event
    id. State co-partitions with the implicit groupBy on the keys; no
    extra exchange beyond that one shuffle.
    """
    keys = keys or ["event_id"]
    return events.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(
        keys
    )

"""Custom stateful streaming operator: per-key session windows via
applyInPandasWithState.

The reference's only stateful operator is the keyed tumbling window
(MyAggFunction.java:19-51), which Spark's built-in windowed aggregation
covers (operators/report.py). THIS module declares the genuinely-custom
path the built-ins can't express: arbitrary per-key state machines —
here 30-minute-gap sessionization with event-time timeouts, the
streaming twin of the batch `sessionize` query key
(operators/relational.py).

Scale design: state is one fixed-width tuple per live key (3 longs),
partitioned by the grouping key across executors by the state store;
Arrow batches carry each key's rows into Python once per micro-batch
(no per-row serde). RocksDB state store
(spark.sql.streaming.stateStore.providerClass) holds state off-heap
when the live-key set outgrows memory — the same knob the reference
left commented out (DataClean.java:54).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
# (session_start_s, last_event_s, n_events) — epoch seconds.
STATE_SCHEMA = "start long, last long, n long"


def _sessions_for_key(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Walk this key's events in event-time order, emitting a session
    row whenever a gap > SESSION_GAP_S closes one; the open session
    lives in `state` between micro-batches and is flushed by the
    event-time timeout once the watermark passes last_event + gap."""
    (user_id,) = key

    def _emit(rows: list[tuple[int, int, int]]) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": pd.Series([user_id] * len(rows), dtype="int64"),
                "session_start": pd.to_datetime([r[0] for r in rows], unit="s"),
                "session_end": pd.to_datetime([r[1] for r in rows], unit="s"),
                "n_events": pd.Series([r[2] for r in rows], dtype="int64"),
            }
        )

    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield _emit([(start, last, n)])
        return

    ts: list[int] = []
    for pdf in pdfs:
        ts.extend(int(v) for v in pdf["ts"].astype("int64") // 1_000_000_000)
    ts.sort()

    start, last, n = state.get if state.exists else (None, None, 0)
    closed: list[tuple[int, int, int]] = []
    for t in ts:
        if start is None:
            start, last, n = t, t, 1
        elif t - last > SESSION_GAP_S:
            closed.append((start, last, n))
            start, last, n = t, t, 1
        else:
            last, n = t, n + 1
    state.update((start, last, n))
    state.setTimeoutTimestamp((last + SESSION_GAP_S) * 1000)
    if closed:
        yield _emit(closed)


def stream_sessionize(events: DataFrame) -> DataFrame:
    """events(user_id, ts) stream → closed-session stream. Watermark 0 s
    (corpus replays are in order; widen for real disorder) drives both
    late-drop and the timeout that flushes idle sessions."""
    return (
        events.withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessions_for_key,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

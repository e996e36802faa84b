"""Custom stateful streaming operator: event sessionization with
applyInPandasWithState (the Structured Streaming escape hatch for
operators the built-in windowed aggregations can't express — a session
has data-dependent extent, unlike tumbling windows).

Semantics match pipeline.profiling.sessionize (batch form): a session
closes when the gap to the next event exceeds ``gap_minutes``. Per
user-group state holds the one open session (start, end, count); a
closed session is emitted either when a later event arrives past the
gap, or when the event-time timeout fires (watermark passed
session_end + gap). State per key is three numbers — stream-length
independent.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, duration_sec long"
)
STATE_SCHEMA = "start long, end long, n long"


def _emit(user: int, start: int, end: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user],
            "session_start": [pd.Timestamp(start, unit="s")],
            "session_end": [pd.Timestamp(end, unit="s")],
            "n_events": [n],
            "duration_sec": [end - start],
        }
    )


def make_session_fn(gap_minutes: int):
    gap = gap_minutes * 60

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield _emit(user, start, end, n)
            return

        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(t.timestamp()) for t in pdf["ts"])
        ts.sort()
        if state.exists:
            start, end, n = state.get
        elif not ts:
            return
        else:
            start, end, n = ts[0], ts[0], 0
        # fold events into sessions, emitting closed ones. Events are
        # sorted within the batch, but a LATE event (admitted by the
        # watermark in a later batch) can precede the open session:
        # merging uses min/max so the session's extent never moves
        # backwards (the naive end=t produced negative durations and
        # early timeouts), and an event older than start-gap — from an
        # already-gone earlier session — is emitted as its own
        # best-effort singleton rather than corrupting the open one.
        for t in ts:
            if n == 0:
                start, end, n = t, t, 1
            elif t - end > gap:
                yield _emit(user, start, end, n)
                start, end, n = t, t, 1
            elif t < start - gap:
                yield _emit(user, t, t, 1)
            else:
                start, end, n = min(start, t), max(end, t), n + 1
        state.update((start, end, n))
        # close the open session once the watermark passes end + gap
        state.setTimeoutTimestamp((end + gap) * 1000)

    return fn


def sessionize_stream(events: DataFrame, gap_minutes: int = 30, watermark: str = "1 hour") -> DataFrame:
    """events: streaming frame with (user_id, ts). Returns the closed
    sessions stream (append mode)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_fn(gap_minutes),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )

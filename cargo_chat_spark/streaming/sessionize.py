"""Custom stateful streaming operator: session windows via
applyInPandasWithState (SURVEY §2.9 mapping — the "custom stateful
operator" slot; batch equivalent is the oracle-checked ``event_sessions``
query).

State per user_id: the open session (start, end, count). An event extends
the session if it lands within ``gap`` of the current end, else the open
session is emitted and a new one starts. On event-time timeout (watermark
passed end+gap) the final session is emitted — bounded state, late events
beyond the watermark are dropped by the runtime.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint"
)
STATE_SCHEMA = "start long, end long, n long"

# Work in MICROSECONDS end-to-end (ADVICE r1): whole-second truncation
# would flip session assignment for gaps within 1 s of exactly 30 min.
_GAP_US = 30 * 60 * 1_000_000


def _sessionize_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    emitted: list[tuple] = []

    if state.hasTimedOut:
        if state.exists:
            s, e, n = state.get
            emitted.append((user_id, s, e, n))
            state.remove()
    else:
        ts_list: list[int] = []
        for pdf in pdfs:
            # pd.Timestamp.value is epoch nanos -> integer micros (exact)
            ts_list.extend(int(t.value) // 1000 for t in pdf["ts"])
        ts_list.sort()
        if state.exists:
            cur_s, cur_e, cur_n = state.get
        else:
            cur_s = cur_e = cur_n = None
        for t in ts_list:
            if cur_s is None:
                cur_s, cur_e, cur_n = t, t, 1
            elif t - cur_e <= _GAP_US:
                cur_e, cur_n = max(cur_e, t), cur_n + 1
            else:
                emitted.append((user_id, cur_s, cur_e, cur_n))
                cur_s, cur_e, cur_n = t, t, 1
        if cur_s is not None:
            state.update((cur_s, cur_e, cur_n))
            # close the session once event time passes end + gap
            state.setTimeoutTimestamp((cur_e + _GAP_US) // 1000)

    if emitted:
        yield pd.DataFrame(
            {
                "user_id": [e[0] for e in emitted],
                "session_start": [pd.Timestamp(e[1], unit="us") for e in emitted],
                "session_end": [pd.Timestamp(e[2], unit="us") for e in emitted],
                "n_events": [e[3] for e in emitted],
            }
        )


def sessionize_stream(events_stream, watermark: str = "1 hour"):
    """events stream (ts timestamp, user_id bigint, ...) → closed-session
    rows. State is one open session per user — O(active users), bounded by
    the event-time timeout."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

"""Session windows via ``transformWithStateInPandas`` — the Spark 4
StatefulProcessor API (the successor to ``applyInPandasWithState``; same
SURVEY §2.9 "custom stateful operator" slot, same session semantics as
``streaming/sessionize.py`` and the oracle-checked ``event_sessions``
batch query).

Why ship both forms: applyInPandasWithState is the widely-deployed API;
transformWithStateInPandas is where Spark is going — typed state handles
(ValueState), first-class event-time timers instead of a timeout conf, and
evolvable state schema. The processor below is the 1:1 translation:

- ValueState ``session`` = the open (start_us, end_us, n) per user.
- An event extends the session if within the gap of the current end, else
  the closed session is emitted and the state re-seeds.
- An event-time timer at ``end + gap`` closes idle sessions; re-registered
  as the session extends (the API auto-deletes a fired timer; stale timer
  instants for superseded ends are filtered against current state).

State is O(active users); all timestamps are epoch MICROS end-to-end
(ADVICE r1 — second-truncation flips assignments near exact-gap edges).

ENV GATE: the transformWithState protocol needs ``google.protobuf`` (the
state-server wire format) — absent in this container, so ``tws_available()``
gates tests and callers; ``streaming/sessionize.py`` (applyInPandasWithState)
is the always-available form with identical semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint"
)

_GAP_US = 30 * 60 * 1_000_000


def tws_available() -> bool:
    """True iff the transformWithState Python protocol can run here."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _emit(user_id: int, sessions: list[tuple]) -> Iterator[pd.DataFrame]:
    if sessions:
        yield pd.DataFrame(
            {
                "user_id": [user_id for _ in sessions],
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in sessions],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in sessions],
                "n_events": [n for _, _, n in sessions],
            }
        )


def make_sessionizer(gap_us: int = _GAP_US):
    """Factory so the processor class imports lazily (StatefulProcessor is
    a Spark-4-only symbol) and the gap is captured per instance."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SessionizeProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._session = handle.getValueState(
                "session", "start long, end long, n long"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            ts: list[int] = []
            for pdf in rows:
                ts.extend(int(t.value) // 1000 for t in pdf["ts"])
            ts.sort()
            cur = self._session.get() if self._session.exists() else None
            closed: list[tuple] = []
            for t in ts:
                if cur is None:
                    cur = (t, t, 1)
                elif t - cur[1] <= gap_us:
                    cur = (cur[0], max(cur[1], t), cur[2] + 1)
                else:
                    closed.append(cur)
                    cur = (t, t, 1)
            if cur is not None:
                self._session.update(cur)
                # event-time timer closes the session once the watermark
                # passes end + gap (timer instants are epoch millis)
                self._handle.registerTimer((cur[1] + gap_us) // 1000)
            return _emit(user_id, closed)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            (user_id,) = key
            if not self._session.exists():
                return iter(())
            start, end, n = self._session.get()
            # a stale timer (registered for a superseded, shorter end)
            # must not close an extended session early
            if expiredTimerInfo.getExpiryTimeInMs() < (end + gap_us) // 1000:
                return iter(())
            self._session.clear()
            return _emit(user_id, [(start, end, n)])

        def close(self) -> None:
            pass

    return SessionizeProcessor()


def sessionize_stream_tws(events_stream, watermark: str = "1 hour"):
    """events stream (ts timestamp, user_id bigint, ...) → closed sessions,
    via the StatefulProcessor API with event-time timers."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=make_sessionizer(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )

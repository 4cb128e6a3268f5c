"""Timer-driven stateful operators on the transformWithState API
(Spark 4's arbitrary-state surface: named state variables + event-time
timers + TTL, replacing applyInPandasWithState's single-blob state).

Reference counterpart: none — the reference is batch-only (SURVEY.md
§2.10); this extends the engine's streaming family. The operator here is
the canonical timer use case the older API cannot express cleanly:
CLOSE a session when the event-time watermark passes its gap, emitting
the closed session exactly once — applyInPandasWithState can only
piggyback timeouts on processing time or re-derive closure on the next
key activity, so an idle key's final session never flushes until more
data arrives.

Scale: state is one fixed-width tuple per ACTIVE key (closed state is
cleared immediately) plus one registered timer per active key; the state
store partitions by key like every stateful op. Watermark bounds both
memory and result lateness.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.streaming.stateful_processor import ExpiredTimerInfo, TimerValues

_OUT_SCHEMA = "user_id long, start_ms long, end_ms long, n_events long"


class SessionCloseProcessor(StatefulProcessor):
    """Per-key session tracker: merge arriving events into the open
    session (gap rule), emit a session the moment a new event falls
    beyond the gap, and arm an event-time timer at last_event + gap so
    the watermark closes idle keys' final sessions too."""

    def __init__(self, gap_ms: int) -> None:
        self._gap_ms = int(gap_ms)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        # (session_start_ms, last_event_ms, n_events)
        self._sess = handle.getValueState("sess", "start long, last long, n long")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        ts: list[int] = []
        for pdf in rows:
            ts.extend(int(v) for v in pdf["ts_ms"])
        ts.sort()
        cur = tuple(self._sess.get()) if self._sess.exists() else None
        closed: list[tuple[int, int, int, int]] = []
        uid = int(key[0])
        for t in ts:
            if cur is None:
                cur = (t, t, 1)
            elif t - cur[1] <= self._gap_ms:
                cur = (cur[0], max(cur[1], t), cur[2] + 1)
            else:
                closed.append((uid, cur[0], cur[1], cur[2]))
                cur = (t, t, 1)
        if cur is None:
            # empty input batch for a key with no open session (the
            # iterator can legally yield only empty DataFrames): nothing
            # to track, and update(None)/registerTimer would TypeError
            return
        self._sess.update(cur)
        # one armed timer per key: re-arm at the (possibly extended)
        # session's expiry; stale timers are deleted, and the expiry
        # guard in handleExpiredTimer makes a missed delete harmless
        for old in self._handle.listTimers():
            self._handle.deleteTimer(old)
        self._handle.registerTimer(cur[1] + self._gap_ms)
        if closed:
            yield pd.DataFrame(
                closed, columns=["user_id", "start_ms", "end_ms", "n_events"]
            )

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if self._sess.exists():
            s = tuple(self._sess.get())
            # fire only for the CURRENT session's expiry — a stale timer
            # from a since-extended session must not close it early
            if expiredTimerInfo.getExpiryTimeInMs() >= s[1] + self._gap_ms:
                self._sess.clear()
                yield pd.DataFrame(
                    [(int(key[0]), s[0], s[1], s[2])],
                    columns=["user_id", "start_ms", "end_ms", "n_events"],
                )

    def close(self) -> None:
        pass


def closed_sessions_stream(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 minute",
) -> DataFrame:
    """Emit (user_id, start_ms, end_ms, n_events) for every session the
    event-time watermark has CLOSED — sessions still open at the
    watermark stay in state (exactly-once emission, no re-statement,
    unlike aggregation-mode session_window whose windows finalize only
    in append mode with the same watermark mechanics but no per-session
    custom payload).

    Timestamps travel as epoch millis (integer division — cross-engine
    exact) so the pandas processor never touches timezone semantics.

    Requires the ``protobuf`` package (the transformWithState Python
    workers speak a protobuf state protocol to the JVM). Where it is
    absent this raises ImportError naming the dependency; the processor
    LOGIC is still fully unit-tested against a fake handle
    (tests/test_streaming.py), and closed_sessions_batch needs nothing.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "closed_sessions_stream needs the 'protobuf' package "
            "(transformWithState state protocol); install protobuf on "
            "driver and executors"
        ) from e
    gap_ms = _duration_ms(gap)
    src = events_stream.withWatermark("ts", watermark).select(
        "user_id",
        "ts",
        (F.col("ts").cast("long") * 1000).alias("ts_ms"),
    )
    return src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionCloseProcessor(gap_ms),
        outputStructType=_OUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )


def closed_sessions_batch(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 minute"
) -> DataFrame:
    """Batch oracle for closed_sessions_stream over a FINITE input: the
    lag-cumsum sessionization, restricted to sessions the final
    watermark (max ts - delay) would have closed. Same integer-millis
    arithmetic as the stream."""
    gap_ms = _duration_ms(gap)
    wm_ms = _duration_ms(watermark)
    ms = (F.col("ts").cast("long") * 1000).alias("ts_ms")
    e = events.select("user_id", ms)
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts_ms")
    sess = (
        e.withColumn("_prev", F.lag("ts_ms").over(w))
        .withColumn(
            "_new",
            (F.col("_prev").isNull() | (F.col("ts_ms") - F.col("_prev") > gap_ms)).cast(
                "int"
            ),
        )
        .withColumn("_sid", F.sum("_new").over(w))
        .groupBy("user_id", "_sid")
        .agg(
            F.min("ts_ms").alias("start_ms"),
            F.max("ts_ms").alias("end_ms"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )
    final_wm = events.agg((F.max(F.col("ts").cast("long") * 1000) - wm_ms).alias("wm"))
    return (
        sess.join(F.broadcast(final_wm))
        .where(F.col("end_ms") + gap_ms <= F.col("wm"))
        .select("user_id", "start_ms", "end_ms", "n_events")
    )


def _duration_ms(spec: str) -> int:
    n, unit = spec.split()
    mult = {
        "millisecond": 1,
        "second": 1000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
    }[unit.rstrip("s")]
    return int(n) * mult

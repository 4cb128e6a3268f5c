"""Streaming / incremental extensions.

The reference has NO streaming layer (SURVEY.md §2.10 — batch only; even
contrib Hadoop-Streaming is absent from the fork). These ops extend the
engine with Structured Streaming semantics over the `events` table shape.
Each op has a batch form (DuckDB-oracle-checkable) and a streaming form
(readStream-compatible: same expressions + watermark).

Scale: tumbling windows aggregate with partial aggregation per partition;
sessionization uses session_window (streaming) / a lag-cumsum window
(batch) — the batch form shuffles once on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling event-time window counts by event_type (batch form).

    Output: (window_start string, event_type, cnt) — the window start is
    formatted so the result is engine-portable (DuckDB date_trunc oracle).

    Rows with NULL event time are EXCLUDED (r9): a null ts belongs to no
    event-time window — the streaming form's watermark would never admit
    it — and keeping it instead produced an engine-specific null-window
    group (base.py NULL-ordering/null-group boundary).
    """
    events = events.where(F.col("ts").isNotNull())
    w = F.window("ts", width)
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
        )
    )


def tumbling_counts_stream(events_stream: DataFrame, width: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Streaming form of tumbling_counts: identical expressions plus a
    watermark so state is bounded and late data beyond `watermark` is
    dropped deterministically."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Sessionization, batch form: per user, a new session starts when the
    gap to the previous event exceeds `gap_seconds`.

    lag + conditional cumsum over (user_id, ts) — one shuffle on user_id.
    Output: (user_id, session_id, n_events, session_start string).

    Rows with NULL event time are EXCLUDED (r9, tumbling_counts'
    contract): sessionization is ordered by event time, and a null ts
    has no position in that order — unfiltered it rides the engines'
    opposite null-ordering defaults (base.py boundary).
    """
    events = events.where(F.col("ts").isNotNull())
    by_user = Window.partitionBy("user_id").orderBy("ts")
    with_gap = events.withColumn(
        "new_session",
        (
            F.coalesce(
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(by_user)),
                F.lit(gap_seconds + 1),
            )
            > gap_seconds
        ).cast("int"),
    )
    with_sid = with_gap.withColumn(
        "session_id", F.sum("new_session").over(by_user.rowsBetween(Window.unboundedPreceding, 0))
    )
    return with_sid.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )


def sessionize_stream(events_stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Streaming sessionization via the native session_window — state
    bounded by the watermark; the streaming-native equivalent of
    sessionize()."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )

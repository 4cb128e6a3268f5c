"""Stream-stream time-interval join (engine extra; the reference is batch
only — its closest surface is the reduce-side CompositeRecordReader join,
mapred/join/CompositeRecordReader.java, which has no time dimension).

Attribution-style semantics: pair each LEFT event with every RIGHT event
of the same key whose timestamp falls in (left.ts - lookback, left.ts].

Scale: the batch form is an equi-join on the key with a range predicate —
one shuffle per side, SMJ/BHJ chosen by Catalyst, no cross product. The
streaming form adds watermarks on BOTH sides plus the same time bound in
the join condition, which is exactly what lets Spark expire join state
(without the bound, stream-stream state grows forever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bounded(left: DataFrame, right: DataFrame, key: str, lookback_seconds: int) -> DataFrame:
    l_ts, r_ts = F.col("l.ts"), F.col("r.ts")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (r_ts <= l_ts)
        & (r_ts > l_ts - F.expr(f"INTERVAL {lookback_seconds} SECONDS"))
    )
    return left.alias("l").join(right.alias("r"), cond, "inner")


def interval_join(
    left: DataFrame, right: DataFrame, key: str, lookback_seconds: int = 3600
) -> DataFrame:
    """Batch form. Output: key, left event id/ts, right event id/ts."""
    return _bounded(left, right, key, lookback_seconds).select(
        F.col(f"l.{key}").alias(key),
        F.col("l.event_id").alias("left_id"),
        F.col("l.ts").alias("left_ts"),
        F.col("r.event_id").alias("right_id"),
        F.col("r.ts").alias("right_ts"),
    )


def interval_join_stream(
    left_stream: DataFrame,
    right_stream: DataFrame,
    key: str,
    lookback_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming form: same join condition + watermarks on both inputs so
    the state store can evict right-side rows older than the watermark and
    left-side rows that can no longer match."""
    return interval_join(
        left_stream.withWatermark("ts", watermark),
        right_stream.withWatermark("ts", watermark),
        key,
        lookback_seconds,
    )

"""Structured Streaming extensions: the streaming forms must run as real
streams (file source, availableNow trigger, memory sink) and agree with
their batch forms on on-time data."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from hadoop_0_20_2_ljx_spark import catalog
from hadoop_0_20_2_ljx_spark.streaming.windows import (
    sessionize,
    sessionize_stream,
    tumbling_counts,
    tumbling_counts_stream,
)
from tests.conftest import SF_SMOKE

TMP = "/root/repo/.tmp/streaming_src"


def _stage_events(spark):
    ev = catalog.load(spark, SF_SMOKE, "events")
    shutil.rmtree(TMP, ignore_errors=True)
    ev.write.parquet(TMP)
    return ev


def _run_stream(spark, make_stream, name):
    schema = spark.read.parquet(TMP).schema
    src = spark.readStream.schema(schema).parquet(TMP)
    out = make_stream(src)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if name == "tumbling" else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_tumbling_stream_matches_batch(spark):
    ev = _stage_events(spark)
    batch = tumbling_counts(ev, "1 hour")
    streamed = _run_stream(spark, lambda s: tumbling_counts_stream(s, "1 hour"), "tumbling")
    streamed_fmt = streamed.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "cnt",
    )
    assert sorted(map(tuple, batch.collect())) == sorted(map(tuple, streamed_fmt.collect()))


def test_session_stream_counts(spark):
    """session_window (streaming) and lag-cumsum (batch) agree on total
    sessions and events.

    Append mode only emits sessions finalized by the watermark, so a
    sentinel event far in the future (user -1) is staged to advance the
    watermark past every real session, then excluded from the comparison.
    """
    ev = _stage_events(spark)
    sentinel = ev.agg(
        F.lit(-1).cast("long").alias("event_id"),
        (F.max("ts") + F.expr("INTERVAL 10 DAYS")).alias("ts"),
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("flush").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    sentinel.select(*ev.columns).write.mode("append").parquet(TMP)
    batch = sessionize(ev, gap_seconds=1800).agg(
        F.count("*").alias("sessions"), F.sum("n_events").alias("events")
    )
    streamed = (
        _run_stream(spark, lambda s: sessionize_stream(s, gap="30 minutes"), "sessions")
        .filter(F.col("user_id") >= 0)
        .agg(F.count("*").alias("sessions"), F.sum("n_events").alias("events"))
    )
    assert batch.collect()[0] == streamed.collect()[0]


def test_stream_cleanup():
    shutil.rmtree(TMP, ignore_errors=True)
    assert not os.path.exists(TMP)

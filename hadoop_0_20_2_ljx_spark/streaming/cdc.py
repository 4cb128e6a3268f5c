"""Continuous CDC apply: stream -> keep-latest upsert into a keyed
parquet table (foreachBatch). The override() rightmost-wins composite
(mapred/join/OverrideRecordReader.java:44) applied continuously — the
streaming twin of extensions/pipeline_ops.keep_latest_versions.

Scale shape: the table is hash-bucketed by key into ``n_buckets``
partition dirs; each micro-batch (a) reduces itself to per-key latest,
(b) reads back ONLY the buckets the batch touches (partition pruning),
(c) re-resolves keep-latest over old+new, and (d) rewrites just those
buckets via dynamic partition overwrite. Work per batch is proportional
to touched buckets, not table size. The merge is idempotent — replaying
a micro-batch after a failure converges to the same table (the
exactly-once-effect contract foreachBatch asks sinks to provide).

Determinism: winners resolve on (ts, tiebreak) exactly as the batch
operator, so a stream apply and a one-shot batch compaction of the same
input produce identical tables (pinned by tests/test_streaming.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_0_20_2_ljx_spark.extensions.pipeline_ops import keep_latest_versions
from hadoop_0_20_2_ljx_spark.pinning import pin

_BUCKET = "_kb"


def _bucketed(df: DataFrame, key_cols: list[str], n_buckets: int) -> DataFrame:
    key_str = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    return df.withColumn(_BUCKET, F.pmod(F.xxhash64(key_str), F.lit(n_buckets)))


def apply_cdc_batch(
    batch_df: DataFrame,
    table_path: str,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    n_buckets: int = 64,
) -> None:
    """One micro-batch of the upsert (the foreachBatch body)."""
    if not batch_df.take(1):
        return
    spark = batch_df.sparkSession
    latest = _bucketed(
        keep_latest_versions(batch_df, key_cols, ts_col, tiebreak_col),
        key_cols,
        n_buckets,
    )
    touched = [r[_BUCKET] for r in latest.select(_BUCKET).distinct().collect()]
    if os.path.isdir(table_path) and any(
        f.startswith(f"{_BUCKET}=") for f in os.listdir(table_path)
    ):
        cur = spark.read.parquet(table_path).filter(F.col(_BUCKET).isin(touched))
        merged = keep_latest_versions(
            cur.unionByName(latest), key_cols, ts_col, tiebreak_col
        )
    else:
        merged = latest
    # materialize BEFORE overwriting: the merged plan lazily reads the
    # same files dynamic overwrite is about to replace, so the pin must
    # TRUNCATE lineage. pin() now does that in BOTH modes (local ->
    # localCheckpoint; durable -> reliable checkpoint), so routing
    # through it keeps self-overwrite isolation AND lets durable-mode
    # CDC applies survive executor loss mid-overwrite (a localCheckpoint
    # block lost at that point would fail the batch; the reliable
    # checkpoint re-reads from the checkpoint store instead).
    merged = pin(merged)
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(_BUCKET).parquet(table_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)


def cdc_apply_stream(
    events_stream: DataFrame,
    table_path: str,
    checkpoint: str,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    n_buckets: int = 64,
):
    """Start the continuous upsert query (availableNow-compatible)."""

    def body(batch_df: DataFrame, _batch_id: int) -> None:
        apply_cdc_batch(
            batch_df, table_path, key_cols, ts_col, tiebreak_col, n_buckets
        )

    return (
        events_stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_cdc_table(spark, table_path: str) -> DataFrame:
    """The current table state, bucket column dropped."""
    return spark.read.parquet(table_path).drop(_BUCKET)

"""Crash-resumable foreachBatch monitor sinks.

The additive monitors (extensions/audit.py: drift_counts / ks_counts /
bucket_fingerprint) stream via foreachBatch by appending each
micro-batch's sufficient statistics and re-merging. foreachBatch,
however, is only AT-LEAST-ONCE: Structured Streaming's checkpoint
commits a micro-batch AFTER the user function returns, so a crash
mid-batch leaves that batch uncommitted and the restarted query REPLAYS
it — a plain ``.mode("append")`` stats sink then double-counts the
replayed batch (and may additionally contain a partial write from the
crashed attempt). At 1000-executor scale with preemptible machines,
mid-batch death is routine, not exceptional.

The fix is the standard idempotent-sink discipline: key every write by
``batch_id``. Structured Streaming guarantees a replayed micro-batch
reuses the SAME batch_id with the SAME input slice (the offset log is
written before the batch runs), so overwriting the batch's own
directory makes replay self-healing — partial or duplicate output from
the failed attempt is simply rewritten, and the merged monitor state is
exactly the uninterrupted run's. Reference analog: JobTracker restart
recovers completed jobs from the JobHistory log and re-runs incomplete
ones (mapred/JobHistory.java:76, JobTracker.RecoveryManager) — same
commit-log-then-replay model, per micro-batch instead of per job.

Proven by tests/test_streaming.py::test_kill_and_resume_* — a monitor
query is crashed mid-batch (after a deliberate partial write), restarted
from the same checkpoint, and the final state is asserted bit-equal to
a one-shot run.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def idempotent_monitor_sink(
    stats_fn: Callable[[DataFrame], DataFrame], out_dir: str
) -> Callable[[DataFrame, int], None]:
    """Wrap a per-batch sufficient-statistics function as a foreachBatch
    body whose writes are idempotent under micro-batch replay.

    Each batch's stats land in ``{out_dir}/batch_id={id}`` with
    overwrite, so a replayed batch replaces its own (possibly partial)
    prior output instead of appending a duplicate. Read the accumulated
    stats back with ``spark.read.parquet(out_dir)`` (the batch_id
    partition column is discovered and ignored by the merge's groupBy)
    and finalize with the monitor's merge function
    (merge_drift_counts / merge_ks_counts / merge_fingerprints).

    Cost: identical to append mode — one overwrite of an
    O(groups x bins)-row directory per batch; nothing re-scans history.
    """

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        stats_fn(batch_df).write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    return on_batch

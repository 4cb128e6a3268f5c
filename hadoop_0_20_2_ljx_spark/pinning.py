"""Working-table pinning: materialize a small/medium intermediate once so
multiple consumers (or the next loop round) don't re-derive its lineage.

The reference engine made this trade implicitly: every MapReduce job
boundary wrote its output to HDFS (reliable, re-readable, slow —
mapred/FileOutputCommitter.java), so iterative drivers paid a full
replicated write per round. Spark gives a spectrum; this module exposes
the two endpoints behind one switch so the SAME code runs in both
postures:

``spark.ljx.pin.mode`` (session conf, read per call):

- ``local`` (default): ``localCheckpoint(eager=True)`` — blocks live in
  executor local store (MEMORY_AND_DISK), lineage truncated. Fastest;
  on executor loss the blocks are gone and the JOB fails (job-level
  retry recomputes from source). The right trade for short jobs and
  local/bench runs.
- ``durable``: ``persist(StorageLevel.DISK_ONLY)`` + eager count().
  Lineage is KEPT, so a lost executor's blocks are recomputed from
  source instead of failing the job — the production posture for
  long-running jobs on preemptible/spot executors. Cost: plan objects
  grow across loop rounds (bounded here: every iterative caller runs
  O(log n) or constant rounds) and a disk write per pin.

Both modes materialize eagerly, so "scan once, consume N times" holds
identically; results are mode-invariant (pinned CONTENT is the same —
pinned tables are deterministic), asserted in tests/test_pinning.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

PIN_MODE_CONF = "spark.ljx.pin.mode"


def pin(df: DataFrame) -> DataFrame:
    """Materialize ``df`` now and truncate/cache its lineage per the
    session's ``spark.ljx.pin.mode`` (see module docstring). Chain-safe:
    ``df.transform(pin)``."""
    mode = df.sparkSession.conf.get(PIN_MODE_CONF, "local")
    if mode == "durable":
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.DISK_ONLY)
        out.count()  # eager: materialize before consumers fork the plan
        return out
    return df.localCheckpoint(eager=True)

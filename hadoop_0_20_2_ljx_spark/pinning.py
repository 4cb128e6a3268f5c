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
- ``durable``: ``checkpoint(eager=True)`` — RELIABLE checkpoint:
  blocks written to the checkpoint dir (HDFS/object store on a real
  cluster; ``spark.ljx.pin.checkpointDir``), lineage truncated. A lost
  executor's blocks re-read from replicated storage instead of failing
  the job — the production posture for long-running jobs on
  preemptible/spot executors. Truncation also keeps iterative callers'
  plans constant-size per round (kept lineage grew k-core's plan tree
  2^rounds and OOMed the driver building treeString). Cost: a
  replicated write per pin.

Both modes materialize eagerly, so "scan once, consume N times" holds
identically; results are mode-invariant (pinned CONTENT is the same —
pinned tables are deterministic), asserted in tests/test_pinning.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

PIN_MODE_CONF = "spark.ljx.pin.mode"
CHECKPOINT_DIR_CONF = "spark.ljx.pin.checkpointDir"


def pin(df: DataFrame) -> DataFrame:
    """Materialize ``df`` now and truncate/cache its lineage per the
    session's ``spark.ljx.pin.mode`` (see module docstring). Chain-safe:
    ``df.transform(pin)``.

    Durable mode uses RELIABLE checkpoint (lineage truncated, blocks in
    the checkpoint dir — HDFS/object store on a cluster, set via
    ``spark.ljx.pin.checkpointDir`` or SparkContext.setCheckpointDir; a
    session-scoped local temp dir is auto-set otherwise so local runs
    work out of the box). The r4 design (persist DISK_ONLY, lineage
    KEPT) recomputed lost blocks from source but let iterative callers'
    plan TREES grow exponentially: k-core references its pinned edge
    set twice per peeling round, so by round r the kept-lineage plan
    held 2^r copies of round 0 — at depth ~20 the plan's own
    treeString OOMed the driver (found by the registry-wide durable
    sweep, r5). Checkpoint keeps the per-round plan constant-size AND
    survives executor loss — strictly better on both axes for the
    preemptible-executor posture the mode is for.
    """
    mode = df.sparkSession.conf.get(PIN_MODE_CONF, "local")
    if mode == "durable":
        spark = df.sparkSession
        sc = spark.sparkContext
        if sc.getCheckpointDir() is None:
            conf_dir = spark.conf.get(CHECKPOINT_DIR_CONF, None)
            if conf_dir is None and not sc.master.startswith("local"):
                # A driver-local temp dir on a real cluster means every
                # executor checkpoints to its OWN filesystem and any
                # cross-executor read dies with FileNotFoundException —
                # fail fast instead of corrupting the durability story.
                raise ValueError(
                    "durable pin mode on a cluster needs a shared "
                    f"checkpoint dir: set {CHECKPOINT_DIR_CONF} to an "
                    "HDFS/object-store path (or call "
                    "SparkContext.setCheckpointDir)"
                )
            if conf_dir is None:
                import atexit
                import shutil
                import tempfile

                conf_dir = tempfile.mkdtemp(prefix="ljx-pin-ckpt-")
                # cleanCheckpoints only removes checkpoint FILES on RDD
                # GC, never the dir, and not on abrupt exit — without
                # this, repeated sweep/bench sessions leak disk.
                atexit.register(shutil.rmtree, conf_dir, ignore_errors=True)
            # NOTE: the checkpoint dir is session-sticky — this conf is
            # read only before the FIRST durable pin; once
            # getCheckpointDir() is set, later changes to
            # spark.ljx.pin.checkpointDir are ignored for the session.
            sc.setCheckpointDir(conf_dir)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)

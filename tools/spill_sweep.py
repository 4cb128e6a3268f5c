"""Registry-wide SPILL sweep: replay EVERY registry query with Spark's
force-spill thresholds cranked down so sorts, sort-merge joins, window
buffers, and aggregations take their disk-spill paths, and oracle-compare
each result.

Run (from any cwd; ~6 min at sf0.01):

    python tools/spill_sweep.py /root/testdata/sf0.01

Expect a final ``SPILL: <N> pass, 0 fail of <N>`` line. Every other
robustness axis (broadcast-off, split-size, AQE-off, ...) varies
planning or decode; none forces the memory-pressure path. The
reference's io.sort.mb spill/merge machinery (mapred/MapTask.java's
SpillThread, §4.2) is exactly the part of its runtime Spark supersedes
with UnsafeExternalSorter + ExternalAppendOnlyUnsafeRowArray — this
sweep proves results survive that machinery actually engaging, which a
1000-executor run against 100 TB does on every stage.

Mechanism: at sf0.01 the inputs are ~10 MB, so *memory-capping* confs
(spark.memory.fraction, small driver heap) would never trigger a spill
— a "spill sweep" built that way passes vacuously. Instead this uses
the element-count force-spill thresholds (the same knobs Spark's own
test suites use to exercise these paths deterministically):

  - spark.shuffle.spill.numElementsForceSpillThreshold — every
    UnsafeExternalSorter / ExternalSorter (global sorts, shuffle-side
    sorts) spills to disk every 1024 records;
  - spark.sql.sortMergeJoinExec.buffer.{in.memory,spill}.threshold —
    SMJ's buffered-match-side ExternalAppendOnlyUnsafeRowArray tips to
    a spilling sorter after 256 rows (broadcast is disabled so joins
    actually plan SMJ, as at cluster scale);
  - spark.sql.windowExec.buffer.{in.memory,spill}.threshold — window
    partition buffers spill after 256 rows;
  - spark.sql.objectHashAggregate.sortBased.fallbackThreshold —
    ObjectHashAggregate (collect_list/collect_set paths) falls back to
    sort-based aggregation after 16 distinct keys.

A verify hook then reads the UI stage metrics and FAILS the sweep if
the replay recorded zero spilled bytes — the gate asserts the path ran,
not just that the confs were set. Results must be bit-identical to the
default-mode oracle comparison: a divergence here means an operator's
output depends on what stayed in memory (ordering assumptions over
buffered iterators are the classic case), which is
correctness-by-coincidence at 100 TB.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


def _check_spilled(spark) -> None:
    """Assert the replay actually spilled (REST stage metrics)."""
    import json as _json
    import urllib.request

    sc = spark.sparkContext
    base = sc.uiWebUrl
    assert base, "spill check needs the UI REST API (spark.ui.enabled)"
    url = f"{base}/api/v1/applications/{sc.applicationId}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as resp:
        stages = _json.load(resp)
    disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    n_stages = sum(1 for s in stages if s.get("diskBytesSpilled", 0) > 0)
    print(
        f"spill check: {disk / 1e6:.1f} MB disk / {mem / 1e6:.1f} MB memory "
        f"spilled across {n_stages} stages"
    )
    assert disk > 0, "sweep ran but nothing spilled — the gate is vacuous"


def main() -> int:
    from durable_sweep import run_sweep

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # Optional second arg: the shuffle-sorter force-spill threshold.
    # The merge phase opens one reader per spill FILE, each allocating
    # 2x spark.unsafe.sorter.spill.reader.buffer.size — and that conf
    # FLOORS at 1 MiB, so fan-in memory is ~2 MB per spill file per
    # task and the only lever is the file count itself. 1024 rows is
    # right for sf0.01 (~8.5k rows/task -> ~8 files); at sf0.1 a
    # 600k-row single-task sort under 1024 made ~600 files and the
    # merge OOMed an 8 GB heap on READER BUFFERS, not data (measured:
    # heap OOM in ReadAheadInputStream via UnsafeSorterSpillReader).
    # Scale the threshold ~10x per decade of rows — the spill PATH is
    # exercised identically; only the forced file count changes:
    #   python tools/spill_sweep.py /root/testdata/sf0.1 8192
    threshold = sys.argv[2] if len(sys.argv) > 2 else "1024"
    return (
        0
        if run_sweep(
            sf_dir,
            "SPILL",
            "local[13]",
            {
                # force-spill thresholds (static core conf first: it is
                # read from SparkEnv at sorter construction, so it must
                # land at builder time — run_sweep passes these to the
                # builder before getOrCreate)
                "spark.shuffle.spill.numElementsForceSpillThreshold": threshold,
                # headroom for the merge fan-in described above (the
                # builder default in run_sweep is 8g)
                "spark.driver.memory": "16g",
                "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold": "256",
                "spark.sql.sortMergeJoinExec.buffer.spill.threshold": "256",
                "spark.sql.windowExec.buffer.in.memory.threshold": "256",
                "spark.sql.windowExec.buffer.spill.threshold": "256",
                "spark.sql.objectHashAggregate.sortBased.fallbackThreshold": "16",
                # joins must plan SMJ for the SMJ thresholds to matter —
                # the regime a 100 TB cluster runs anyway
                "spark.sql.autoBroadcastJoinThreshold": "-1",
                # few, fat partitions: more rows per task crosses the
                # thresholds more often
                "spark.sql.shuffle.partitions": "7",
                # UI on so _check_spilled can read stage spill metrics
                "spark.ui.enabled": "true",
                "spark.ui.port": "4952",
                "spark.ui.retainedStages": "100000",
            },
            verify=_check_spilled,
        )
        == 0
        else 1
    )


if __name__ == "__main__":
    sys.exit(main())

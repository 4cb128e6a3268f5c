"""Registry-wide INPUT-SPLIT sweep: replay EVERY registry query with
`spark.sql.files.maxPartitionBytes` forced down to 256 KiB (and the
file-packing open cost down with it) and oracle-compare each result.

Run (from any cwd; ~5 min at sf0.01):

    python tools/split_sweep.py /root/testdata/sf0.01

Expect a final ``splits=256k: <N> pass, 0 fail of <N>`` line. This is
the scan-side twin of partition_sweep (which varies SHUFFLE
parallelism): at sf0.01 every fixture file is one comfortable input
split, but a 100 TB deployment reads millions of splits with file and
row-group boundaries landing mid-record for the byte-range formats —
the exact concern the reference's FileInputFormat.getSplits /
LineRecordReader model exists for (mapred/FileInputFormat.java:199-253,
LineRecordReader's skip-first-partial-line contract). Forcing ~256 KiB
splits makes every multi-megabyte scan — parquet tables, and the text/
CSV/JSON/KV roundtrip scans inside the sink queries — read as many
splits locally, so a result that depends on one-file-one-split (a
split-straddling line counted twice or dropped, an order assumption
off a single scan task) diverges here. Complements the per-format
multi-split pins in tests/test_sources.py by making split-count
invariance a registry-wide gate.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


def main() -> int:
    from durable_sweep import run_sweep

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    return (
        0
        if run_sweep(
            sf_dir,
            "splits=256k",
            "local[13]",
            {
                "spark.sql.files.maxPartitionBytes": "262144",
                "spark.sql.files.openCostInBytes": "65536",
            },
        )
        == 0
        else 1
    )


if __name__ == "__main__":
    sys.exit(main())

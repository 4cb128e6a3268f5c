"""Registry-wide partition-count invariance sweep: replay EVERY registry
query under deliberately odd parallelism (7 shuffle partitions on
local[13] instead of the usual 32/32) and oracle-compare each result.

Run (from any cwd; ~6 min at sf0.01):

    python tools/partition_sweep.py /root/testdata/sf0.01

Expect a final ``PARTITIONS=7: <N> pass, 0 fail of <N>`` line. This is
the mechanical form of the retry/scale invariance contract: a query
whose answer shifts with partition count or per-partition order (float
summation order, un-tie-broken windows, rand() sampling, first()/head
nondeterminism) fails its oracle here even though it passes at the
default parallelism. At 1000 executors the partitioning is never the
one you tested locally — every query must be invariant to it.
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
            "PARTITIONS=7",
            "local[13]",
            {
                "spark.sql.shuffle.partitions": "7",
                "spark.default.parallelism": "7",
            },
        )
        == 0
        else 1
    )


if __name__ == "__main__":
    sys.exit(main())

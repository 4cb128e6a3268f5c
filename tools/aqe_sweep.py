"""Registry-wide AQE-OFF sweep: replay EVERY registry query with adaptive
query execution disabled and oracle-compare each result.

Run (from any cwd; ~5 min at sf0.01):

    python tools/aqe_sweep.py /root/testdata/sf0.01

Expect a final ``AQE=off: <N> pass, 0 fail of <N>`` line. The driver's
default session runs AQE ON (Spark 4 default): runtime partition
coalescing, skew-join splitting, and broadcast demotion/promotion all
re-plan mid-query, and the engine has code that REASONS about partition
assignment across jobs (operators/sorts.with_global_row_number pins its
ranged frame with an eager localCheckpoint precisely because AQE may
coalesce the range exchange differently per job). A query that is only
correct WITH adaptive re-planning — or only correct without it — is a
correctness-by-coincidence bug that a 1000-executor deployment with
different AQE thresholds would surface; this sweep pins the
plan-strategy-invariance contract from the opposite side of the
partition_sweep (which varies the static partition count).
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
            "AQE=off",
            "local[13]",
            {
                "spark.sql.adaptive.enabled": "false",
            },
        )
        == 0
        else 1
    )


if __name__ == "__main__":
    sys.exit(main())

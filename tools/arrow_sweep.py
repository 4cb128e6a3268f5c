"""Registry-wide ARROW-BATCH sweep: replay EVERY registry query with
`spark.sql.execution.arrow.maxRecordsPerBatch=7` (a deliberately tiny,
odd Arrow batch size) and oracle-compare each result.

Run (from any cwd; ~5 min at sf0.01):

    python tools/arrow_sweep.py /root/testdata/sf0.01

Expect a final ``arrow=7: <N> pass, 0 fail of <N>`` line. The
iterator-style Pandas surfaces — mapInPandas (the multimodal
decode/feature path), scalar pandas UDFs, the tokenize UDTF's input
stream — receive their input as a SEQUENCE of Arrow record batches,
and the 10,000-row default hides any logic that accidentally assumes
one batch per partition (state initialized per-batch, a mapInPandas
that yields per-batch aggregates as if they were per-partition, a
cross-row feature computed inside one batch). On a 1000-executor
cluster the batch boundaries land wherever the Arrow writer cuts
them; forcing 7-row batches locally makes every boundary-crossing
bug fire at sf0.01. (The grouped surfaces — applyInPandas UDAF,
cogrouped join — get whole groups by API contract regardless of this
conf; they ride along as regression coverage.) The Python-worker twin
of partition_sweep (shuffle boundaries) and split_sweep (scan
boundaries).
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
            "arrow=7",
            "local[13]",
            {
                "spark.sql.execution.arrow.maxRecordsPerBatch": "7",
            },
        )
        == 0
        else 1
    )


if __name__ == "__main__":
    sys.exit(main())

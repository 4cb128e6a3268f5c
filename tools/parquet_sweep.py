"""Registry-wide NON-VECTORIZED parquet reader sweep: replay EVERY
registry query with `spark.sql.parquet.enableVectorizedReader=false`
and oracle-compare each result.

Run (from any cwd; ~6 min at sf0.01):

    python tools/parquet_sweep.py /root/testdata/sf0.01

Expect a final ``vectorized=off: <N> pass, 0 fail of <N>`` line. The
default columnar-batch reader and the parquet-mr row-at-a-time fallback
are entirely different decode paths, and Spark silently selects the
fallback per-file/per-schema in production (nested schemas past the
supported shapes, complex-type edge cases) — so at 100 TB a fraction of
splits read through it no matter what the session default says. The
fixtures make this axis load-bearing here: events.parquet carries
TIMESTAMP(NANOS), the exact reader-path-sensitive shape the r3 lesson
(catalog.load normalization, never read events raw) exists for — this
sweep proves the normalization and every downstream epoch-nanos
contract hold on BOTH decode paths, next to codegen_sweep (interpreted
expressions) and split_sweep (scan split boundaries).
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
            "vectorized=off",
            "local[13]",
            {
                "spark.sql.parquet.enableVectorizedReader": "false",
            },
        )
        == 0
        else 1
    )


if __name__ == "__main__":
    sys.exit(main())

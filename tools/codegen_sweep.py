"""Registry-wide interpreted-path sweep: replay EVERY registry query with
whole-stage codegen DISABLED (and the expression codegen factory forced
to NO_CODEGEN) and oracle-compare each result.

Run (from any cwd; ~5 min at sf0.01):

    python tools/codegen_sweep.py /root/testdata/sf0.01

Expect a final ``CODEGEN=off: <N> pass, 0 fail of <N>`` line. Spark
evaluates every expression twice over its lifetime — codegen'd in the
hot path, interpreted under codegen fallback (compilation failures,
>8k-bytecode methods, CodegenFallback operators like every higher-order
function) — and the two paths are separate implementations that have
historically diverged (NULL handling, overflow, UTF-8 edge cases). The
engine's text family rides HOFs heavily (bind-once gram builders,
lang-ID/quality scoring), which already run interpreted inside
codegen'd projections; this sweep forces the WHOLE plan down the
interpreted path so a divergence shows up as an oracle mismatch rather
than a silent production inconsistency on whatever 100 TB task happens
to trip codegen fallback.
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
            "CODEGEN=off",
            "local[13]",
            {
                "spark.sql.codegen.wholeStage": "false",
                "spark.sql.codegen.factoryMode": "NO_CODEGEN",
            },
        )
        == 0
        else 1
    )


if __name__ == "__main__":
    sys.exit(main())

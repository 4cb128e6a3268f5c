"""Registry-wide ANSI-dialect invariance sweep: replay EVERY registry
query with ``spark.sql.ansi.enabled=false`` and oracle-compare each
result.

Run (from any cwd; ~3 min at sf0.01):

    python tools/ansi_sweep.py /root/testdata/sf0.01

Expect a final ``ANSI=false: <N> pass, 0 fail of <N>`` line. The engine
runs ANSI mode ON (session.py), so this sweep proves no query's answer
leans on ANSI error semantics: arithmetic stays in ranges where wrap vs
error cannot differ (DECIMAL(38,0) internal sums, BIGINT DIV, cents
integers), lookups use explicit guards rather than relying on
out-of-bounds errors, and casts are total on their actual domains. A
query that only works because ANSI throws on the path it never meant to
take would silently return wrong answers on a cluster configured
non-ANSI; it fails its oracle here instead. First wrapped run r8 (ad
hoc form green since r5).
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
            "ANSI=false",
            "local[13]",
            {"spark.sql.ansi.enabled": "false"},
        )
        == 0
        else 1
    )


if __name__ == "__main__":
    sys.exit(main())

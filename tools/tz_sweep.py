"""Registry-wide SESSION-TIMEZONE sweep: replay EVERY registry query
with ``spark.sql.session.timeZone=America/New_York`` (UTC-5/-4, DST
boundary inside the fixture's date range) and oracle-compare against
DuckDB running at its default timezone.

Run (from any cwd; ~5 min at sf0.01):

    python tools/tz_sweep.py /root/testdata/sf0.01

Expect a final ``TZ=America/New_York: <N> pass, 0 fail of <N>`` line —
ZERO divergences is the contract. The engine's own session builder pins
UTC (session.py), but the external driver builds its OWN session and
does not; every query must therefore be timezone-invariant on its own:
event time rides ``timestamp_ntz`` (catalog.load normalizes — the
round-3 lesson) or integer epoch nanos, never a session-tz-dependent
TIMESTAMP, and no query calls from_utc_timestamp/current_timestamp/
current_date (grep-clean at HEAD). A divergence here is a latent
tz-dependence that a cluster whose JVM default isn't UTC would surface
as silently shifted windows/dates. Same family as tools/aqe_sweep.py
(plan-strategy invariance) and tools/epoch_sweep.py (negative-epoch
div discipline): one session knob a production deployment WILL hold
differently, replayed over the full registry as a standing gate.
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
            "TZ=America/New_York",
            "local[13]",
            {
                "spark.sql.session.timeZone": "America/New_York",
            },
        )
        == 0
        else 1
    )


if __name__ == "__main__":
    sys.exit(main())

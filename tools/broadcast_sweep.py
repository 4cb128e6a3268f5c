"""Registry-wide BROADCAST-OFF sweep: replay EVERY registry query with
`spark.sql.autoBroadcastJoinThreshold=-1` (no automatic broadcast joins)
and oracle-compare each result.

Run (from any cwd; ~5 min at sf0.01):

    python tools/broadcast_sweep.py /root/testdata/sf0.01

Expect a final ``broadcast=off: <N> pass, 0 fail of <N>`` line. At
sf0.01 nearly every dimension/build side fits under the default 10 MB
threshold, so the driver's correctness gate exercises the
broadcast-hash-join regime almost exclusively — but at 100 TB those
same sides are corpus-sized and Catalyst plans sort-merge or
shuffled-hash joins instead. A query whose RESULT depends on the join
strategy (e.g. an ordering assumption that BHJ's build-side iteration
happens to satisfy, or a non-deterministic tie the single-node
broadcast hides) is correctness-by-coincidence that the scale-up
surfaces. This sweep pins join-strategy result-invariance from the
third side, next to aqe_sweep (runtime re-planning off) and
partition_sweep (odd static parallelism); the bench's *_10x stress
pairs already force this regime for performance curves — this makes
the same regime a registry-wide CORRECTNESS gate. Explicit
``F.broadcast()`` hints (q_join_broadcast's DistributedCache parity)
are still honored with the threshold at -1, which is exactly the
production contract: hints survive, size-based auto-promotion does not.
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
            "broadcast=off",
            "local[13]",
            {
                "spark.sql.autoBroadcastJoinThreshold": "-1",
            },
        )
        == 0
        else 1
    )


if __name__ == "__main__":
    sys.exit(main())

"""Shared core for the boundary-replay sweeps (null_sweep,
nonfinite_sweep, unicode_sweep, epoch_sweep): build a mutated fixture,
replay every registry query through tools/driver_sim.py, and diff the
divergence set against the sweep's locked expectation. Both directions
fail — an unexpected divergence is a regression in a pinned contract, a
recorded divergence that starts passing is an improvement that must be
recorded deliberately (shrink the list AND the queries/base.py note)."""

from __future__ import annotations

import importlib.util
import os
import sys

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def replay_and_diff(
    fixture_builder,
    dst: str,
    expected_divergent: set[str],
    label: str,
) -> int:
    """Build the fixture at ``dst``, run the driver simulator against it,
    and compare failures with ``expected_divergent``. Returns a process
    exit code (0 = expectation holds exactly)."""
    fixture_builder(dst)
    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "driver_sim", os.path.join(here, "driver_sim.py")
    )
    sim = importlib.util.module_from_spec(spec)
    sys.argv = ["driver_sim.py", dst]
    spec.loader.exec_module(sim)
    try:
        rc = sim.main()
    except SystemExit as e:
        rc = int(e.code or 0)
    failed = set(getattr(sim, "LAST_FAILED", set()))
    unexpected = sorted(failed - expected_divergent)
    fixed = sorted(expected_divergent - failed)
    if unexpected:
        print(f"UNEXPECTED {label} divergence (regression): {unexpected}")
        return 1
    if fixed:
        print(
            f"{label} replay NOW PASSING (shrink EXPECTED_DIVERGENT and the "
            f"queries/base.py note): {fixed}"
        )
        return 1
    print(f"{label} sweep OK: {len(failed)} expected divergences, 0 unexpected")
    return 0 if rc in (0, 1) else rc

"""The driver-materialization audit runs green at HEAD.

tools/collect_audit.py is Spark-free and instant, so unlike the plan
audit (which needs a session) it can ride the pytest gate: any new
`.collect()`/`.toPandas()`/`.take()`/`.first()` site in engine source
fails this test until it carries a reviewed bounded-size reason in the
tool's _ACCEPTED list — the SCALE.md no-driver-collect posture as a
mechanical check instead of a per-round manual re-audit.
"""

import importlib.util
import os


def test_collect_audit_green():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "collect_audit", os.path.join(here, "tools", "collect_audit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.main() == 0

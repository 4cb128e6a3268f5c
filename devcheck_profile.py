"""Per-query wall-clock profile of the full registry at sf0.01 —
diagnoses the round-1 driver-coverage gap (8 late-registry queries had no
CORRECTNESS rows; hypothesis: per-round time budget)."""

from __future__ import annotations

import json
import sys
import time

from hadoop_0_20_2_ljx_spark.session import get_spark
from hadoop_0_20_2_ljx_spark.oracle import run_query
from hadoop_0_20_2_ljx_spark.queries import REGISTRY

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark()
    t0 = time.time()
    out = {}
    for name in REGISTRY:
        t = time.time()
        try:
            ok, msg = run_query(name, spark, SF_DIR)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC {type(e).__name__}: {e}"
        dt = time.time() - t
        out[name] = round(dt, 2)
        print(f"{dt:7.2f}s  {'ok ' if ok else 'FAIL'}  {name}  {msg[:100]}", flush=True)
    total = time.time() - t0
    print(f"TOTAL {total:.1f}s for {len(REGISTRY)} queries")
    slow = dict(sorted(out.items(), key=lambda kv: -kv[1])[:12])
    print("SLOWEST:", json.dumps(slow))


if __name__ == "__main__":
    main()

"""Natural-memory-pressure probe: the total-order sort at 300M generated
100-byte rows (~30 GB of in-memory records) on a deliberately capped
16 GB driver heap, so the Tungsten sorters spill because they are OUT OF
MEMORY — not because a forced element-count threshold told them to.

    python tools/pressure_probe.py          # one-off, ~5 min, prints JSON

Complements tools/spill_sweep.py from the other side: the sweep proves
all 186 registry results survive the spill PATH (forced deterministically
at small data), this proves the flagship sort survives real PRESSURE at
a data:execution-memory ratio ~3:1 — the shape every task on a 100 TB
cluster runs at. TeraValidate-style order+checksum asserts run inside
(bench.bench_terasort), and the probe FAILS unless the run actually
spilled to disk, so it cannot pass vacuously on a roomy heap.

Disk note: tera rows compress ~9:1 in shuffle/spill files (the filler is
repetitive — the 10M bench rung writes 113 MB of shuffle for 1 GB of
rows), so the on-disk footprint is a few GB, safe on this container.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    from pyspark.sql import SparkSession

    import bench

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("pressure-probe")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4953")
        .config("spark.ui.retainedStages", "100000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    n = 300_000_000
    t = time.time()
    bench.bench_terasort(spark, n=n)  # order+checksum asserts inside
    wall = time.time() - t

    import urllib.request

    sc = spark.sparkContext
    url = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as resp:
        stages = json.load(resp)
    out = {
        "rows": n,
        "wall_s": round(wall, 1),
        "disk_spill_mb": round(sum(s.get("diskBytesSpilled", 0) for s in stages) / 1e6, 1),
        "mem_spill_mb": round(sum(s.get("memoryBytesSpilled", 0) for s in stages) / 1e6, 1),
        "shuffle_write_mb": round(sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6, 1),
        "n_spilling_stages": sum(1 for s in stages if s.get("diskBytesSpilled", 0) > 0),
    }
    print(json.dumps(out))
    assert out["disk_spill_mb"] > 0, "no natural spill — the probe is vacuous"
    return 0


if __name__ == "__main__":
    sys.exit(main())

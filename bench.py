"""Headline benchmark: the BASELINE.md local-anchor workloads at sf0.1.

Run: python bench.py            (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Workloads map to BASELINE.md "Local BENCH anchor":
  terasort_1m  — ljx terasort: generate 10^6 100-byte rows, total-order
                 sort, TeraValidate-style order+checksum (target <= 60 s)
  tpch_q1      — Q-agg-2 aggregation over lineitem        (target <= 30 s)
  join_3way    — Q-join-4 lineitem><orders><customer      (target <= 45 s)
  wordcount    — Q-agg-1 over documents.text              (target <= 30 s)
Plus representative extension workloads (dedup_minhash, embed_knn) so the
round record tracks the training-data-pipeline ops too.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from hadoop_0_20_2_ljx_spark.operators.generators import tera_gen
from hadoop_0_20_2_ljx_spark.operators.sorts import total_order_sort
from hadoop_0_20_2_ljx_spark.queries import REGISTRY
from hadoop_0_20_2_ljx_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _force(df):
    """Execute the full plan without driver-side materialization cost."""
    df.write.format("noop").mode("overwrite").save()


def bench_terasort(spark) -> None:
    """TeraGen -> total-order sort -> TeraValidate (sortedness + checksum).

    Validation is distributed: per-partition (min, max, count, xor-ish sum)
    then a driver-side boundary monotonicity check over the tiny
    per-partition summary — no collect of data rows (SURVEY.md §7.3).
    """
    n = 1_000_000
    df = tera_gen(spark, n)
    sorted_df = total_order_sort(df, "key")
    summary = (
        sorted_df.select("key", F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .agg(
            F.min("key").alias("lo"),
            F.max("key").alias("hi"),
            F.count("*").alias("cnt"),
            F.sum(F.crc32(F.col("key").cast("binary")) % 1000003).alias("chk"),
        )
        .orderBy("pid")
        .collect()
    )
    total = sum(r["cnt"] for r in summary)
    assert total == n, f"terasort row loss: {total} != {n}"
    bounds = [r for r in summary if r["cnt"] > 0]
    for a, b in zip(bounds, bounds[1:]):
        assert a["hi"] <= b["lo"], f"partition boundary out of order: {a['hi']!r} > {b['lo']!r}"


def main() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="ljx-bench", master=f"local[{cpus}]")
    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0.1)

    registry_workloads = {
        "tpch_q1": "q_agg_tpch_q1",
        "join_3way": "q_join_3way",
        "wordcount": "q_agg_wordcount",
        "dedup_minhash": "q_dedup_minhash",
        "embed_knn": "q_embed_knn",
        "dedup_simhash": "q_dedup_simhash",
        "sort_fingerprint": "q_sort_total_order",
        "window_rank": "q_agg_window_rank",
        "bloom_join": "q_join_bloom",
    }

    # Warm the JVM/codegen once so timings measure the plans, not startup.
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    timings: dict[str, float] = {}
    t0 = time.time()
    timings["terasort_1m"] = -time.time()
    bench_terasort(spark)
    timings["terasort_1m"] += time.time()

    for label, qname in registry_workloads.items():
        t = time.time()
        _force(REGISTRY[qname].spark(spark, SF_DIR))
        timings[label] = time.time() - t

    total = time.time() - t0
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(total, 2),
                "unit": "sec",
                "queries": {k: round(v, 2) for k, v in timings.items()},
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Registry-wide empty-input sweep: replay EVERY registry query against
schema-identical EMPTY tables and require that each one either flows
through (oracle-compared as zero-vs-zero rows) or fails for a reason on
the documented strict list below.

Run (from any cwd; ~4 min):

    python tools/empty_sweep.py

Expect a final ``EMPTY-INPUT CONTRACT: OK`` line. At 100 TB a
filter-to-zero slice is normal data flow — a date partition with no
rows, a language gate that drops everything — and the shared
infrastructure (two-pass prefix sums / global rank, IVF routing, the
pipes line protocol) must pass zero rows through rather than crash
(fixed r8: the zero-arg create_map() offset lookup, toDF inference on
an empty RDD, argmax over an empty codebook). The strict list is the
part that SHOULD refuse: trainers raise a named ValueError (a codebook
learned from nothing is an upstream bug), the audit ppm ratios raise
ANSI division errors (completeness of nothing is undefined), and the
self-generating roundtrip/report queries (sinks writing then reading
their own output, multimodal synthesizing payload rows, CUBE's global
grouping set where Spark emits zero rows and the SQL standard emits
the grand total) legitimately diverge from a zero-row oracle.

A NEW query failing here that is not on the strict list is a real
empty-input bug — fix the operator or, if refusal is correct, add the
name WITH its reason.
"""

from __future__ import annotations

import re
import subprocess
import sys
import tempfile

# name -> why empty input legitimately does not oracle-match (reviewed r8)
STRICT = {
    "q_embed_kmeans": "trainer: named ValueError on empty init",
    "q_embed_pq": "trainer: PQ codebook needs data",
    "q_embed_kmeans_ivf": "trainer chain: Lloyd init empty",
    "q_embed_kmeans_ivf_bcast": "trainer chain: Lloyd init empty",
    "q_embed_ivfpq": "trainer: PQ codebook needs data",
    "q_embed_ivfpq_nprobe": "trainer: PQ codebook needs data",
    "q_embed_ivfpq_rerank": "trainer: PQ codebook needs data",
    "q_dedup_semantic": "trainer: kmeans blocking needs data",
    "q_agg_cube": "Spark emits 0 rows for the global grouping set on empty "
    "input; the SQL standard (and DuckDB) emit the grand-total row",
    "q_agg_rollup": "same global-grouping-set divergence",
    "q_agg_grouping_sets": "same",
    "q_agg_profile": "min/max over zero rows render NULL differently",
    "q_audit_constraints": "ppm ratios raise ANSI division on a zero-row "
    "table by design (completeness of nothing is undefined, not 100%)",
    "q_audit_table_diff": "synthesizes its second snapshot from fixture rows",
    "q_audit_diff_incremental": "same",
    "q_sink_named_outputs": "write_named_outputs returns per-name "
    "partition dir paths that do not exist when the predicate matched "
    "zero rows (PATH_NOT_FOUND, a named error)",
    "q_sink_tar_shards": "zero shards -> named FileNotFoundError",
    "q_sink_har_roundtrip": "archive of nothing diverges from literal oracle",
    "q_sink_compaction": "fragment/compact counters are file-count-driven",
    "q_multimodal_decode": "payload rows are synthesized per fixture doc",
    "q_multimodal_features": "same",
}

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    import pyarrow.parquet as pq

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    with tempfile.TemporaryDirectory(prefix="sf_empty_") as d:
        for t in dict.fromkeys(TABLES):
            sch = pq.read_schema(f"{src}/{t}.parquet")
            pq.write_table(sch.empty_table(), f"{d}/{t}.parquet")
        proc = subprocess.run(
            [sys.executable, "/root/repo/tools/driver_sim.py", d],
            capture_output=True,
            text=True,
            cwd=tempfile.gettempdir(),
        )
    out = proc.stdout
    passed = len(re.findall(r"^PASS ", out, re.M))
    failed = re.findall(r"^FAIL (\S+?):", out, re.M)
    unexpected = sorted(set(failed) - set(STRICT))
    healed = sorted(set(STRICT) - set(failed))
    print(f"flow-through: {passed}; strict (documented): {len(failed)}")
    for name in unexpected:
        print(f"UNEXPECTED empty-input failure: {name}")
    for name in healed:
        print(f"note: {name} now passes on empty input — prune it from STRICT")
    if unexpected:
        print("EMPTY-INPUT CONTRACT: BROKEN")
        return 1
    print("EMPTY-INPUT CONTRACT: OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

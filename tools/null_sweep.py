#!/usr/bin/env python
"""Registry-wide 30%-null differential replay (the base.py NULL-ordering
boundary, mechanized). Builds a deterministically nulled copy of the
sf0.001 fixtures (30% of every non-key column, md5-mask per (table,
column, row) — key columns stay non-null so joins/groups keep their
shape), replays every registry query against it with tools/driver_sim.py
semantics, and compares the divergence set against the EXPECTED list
below.

    python tools/null_sweep.py            # exit 1 on any unexpected change

A query NOT in EXPECTED_DIVERGENT that fails the nulled replay is a
regression in a pinned null contract (r9 pinned 10 queries; the pins are
unit-tested in tests/test_null_contracts.py, this sweep re-proves them
end-to-end). A query IN the list that starts passing is progress — move
it out and shrink the list (r10's queue is named in queries/base.py).
"""

from __future__ import annotations

import hashlib
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_SF = "/root/testdata/sf0.001"

# columns that keep their non-null fixture contract (keys: nulling them
# changes join/group shapes, which is a different boundary than ordering)
KEEP = {
    "doc_id", "vec_id", "user_id", "event_id", "o_orderkey", "l_orderkey",
    "l_linenumber", "c_custkey", "s_suppkey", "p_partkey", "n_nationkey",
    "r_regionkey", "ps_partkey", "o_custkey", "l_partkey", "l_suppkey",
    "c_nationkey", "s_nationkey", "n_regionkey",
}

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# the post-r10 divergence set, every name classified in queries/base.py's
# NULL-ordering boundary note: (1) trainers / embedding math fed null
# vectors, (2) text/format roundtrips whose wire form cannot carry NULL.
# The r9-era class (3) — order-sensitive queries with queued pins — was
# pinned in full in r10 (null-safe group joins, order-stat exclusion,
# explicit NULLS FIRST/LAST, null-text-is-empty-doc) and is gone.
EXPECTED_DIVERGENT = {
    # (1) trainers / null-fed embedding math
    "q_dedup_embed", "q_dedup_semantic", "q_embed_ann", "q_embed_ivf",
    "q_embed_ivf_bcast", "q_embed_ivf_nprobe", "q_embed_ivfpq",
    "q_embed_ivfpq_nprobe", "q_embed_ivfpq_rerank", "q_embed_kmeans",
    "q_embed_kmeans_ivf", "q_embed_kmeans_ivf_bcast", "q_embed_knn",
    "q_embed_pq",
    # (2) wire/rendering roundtrips
    "q_filter_skipbad", "q_fn_recordio", "q_multimodal_features",
    "q_proj_fieldsel", "q_scan_bz2_text", "q_scan_gzip_text",
    "q_scan_kv_split", "q_sink_har_roundtrip", "q_sink_schema_evolution",
    "q_sink_tar_shards", "q_sink_tfile_roundtrip",
}


def build_nulled_fixture(dst: str) -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        tab = pq.read_table(f"{SRC_SF}/{t}.parquet")
        n = tab.num_rows
        cols = []
        for name in tab.column_names:
            col = tab[name]
            if name in KEEP or n == 0:
                cols.append(col)
                continue
            mask = pa.array([
                int(hashlib.md5(f"{t}:{name}:{i}".encode()).hexdigest()[:4], 16)
                % 10 < 3
                for i in range(n)
            ])
            cols.append(pc.if_else(mask, pa.nulls(n, col.type), col.combine_chunks()))
        pq.write_table(
            pa.table(dict(zip(tab.column_names, cols))), f"{dst}/{t}.parquet"
        )


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from boundary import replay_and_diff

    dst = os.path.join(tempfile.gettempdir(), "ljx_sf_null")
    return replay_and_diff(build_nulled_fixture, dst, EXPECTED_DIVERGENT, "null")


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Registry-wide NaN/Infinity differential replay (the base.py
non-finite-floats boundary, mechanized — the float-domain sibling of
tools/null_sweep.py). Salts ~10% NaN/+Inf/-Inf into every double column
of the sf0.001 fixtures (md5-mask per (table, column, row); embeddings
get NaN/Inf elements in ~5% of vectors), replays the registry, and
diffs the divergence set against EXPECTED below.

    python tools/nonfinite_sweep.py        # exit 1 on any unexpected change

Expected shape as of r9: 111/186 hash-match; 73 fail LOUDLY on both
engines (the integer-cents contract raises CAST_OVERFLOW /
CAST_INVALID_INPUT under ANSI on non-finite input — the correct posture
for a determinism-first engine: never silently fold NaN into a sum);
2 diverge on named cross-engine semantics (q_agg_profile's non-finite
float->string rendering, q_sort_secondary's NaN-under-negation
ordering). A query leaving this list = a contract change that must be
deliberate.
"""

from __future__ import annotations

import hashlib
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_SF = "/root/testdata/sf0.001"
FLOATS = {
    "c_acctbal", "s_acctbal", "p_retailprice", "o_totalprice",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax", "value",
}
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

EXPECTED_DIVERGENT = {
    # loud ANSI cast errors on both engines (integer-cents boundary) or
    # non-finite arithmetic reaching an integer/struct contract
    "q_agg_approx_quantile", "q_agg_cube", "q_agg_daily", "q_agg_deciles",
    "q_agg_drift_js", "q_agg_drift_ks", "q_agg_gapfill",
    "q_agg_grouping_sets", "q_agg_minmax", "q_agg_multi",
    "q_agg_numeric_hist", "q_agg_outliers", "q_agg_rolling",
    "q_agg_rollup", "q_agg_scd2", "q_agg_stats", "q_agg_tpch_q1",
    "q_agg_tpch_q10", "q_agg_tpch_q11", "q_agg_tpch_q14",
    "q_agg_tpch_q15", "q_agg_tpch_q17", "q_agg_tpch_q18",
    "q_agg_tpch_q19", "q_agg_tpch_q2", "q_agg_tpch_q20",
    "q_agg_tpch_q22", "q_agg_tpch_q3", "q_agg_tpch_q5", "q_agg_tpch_q6",
    "q_agg_tpch_q8", "q_agg_tpch_q9", "q_agg_window_rank",
    "q_agg_winsorize", "q_audit_diff_incremental", "q_audit_fingerprint",
    "q_audit_table_diff", "q_dedup_embed", "q_dedup_keep_latest",
    "q_embed_ann", "q_embed_ivf", "q_embed_ivf_bcast",
    "q_embed_ivf_nprobe", "q_embed_ivfpq", "q_embed_ivfpq_nprobe",
    "q_embed_ivfpq_rerank", "q_embed_kmeans", "q_embed_kmeans_ivf",
    "q_embed_kmeans_ivf_bcast", "q_embed_knn", "q_embed_pq",
    "q_embed_quantize", "q_fn_recordio", "q_join_3way", "q_join_asof",
    "q_join_asof_fwd", "q_join_broadcast", "q_join_inner",
    "q_join_range", "q_join_salted", "q_proj_chain", "q_proj_unpivot",
    "q_sink_compaction", "q_sink_csv_json_roundtrip",
    "q_sink_orc_roundtrip", "q_sink_parquet_roundtrip",
    "q_sink_partitioned", "q_sink_schema_evolution",
    "q_sink_sorted_lookup", "q_sink_zorder", "q_udf_cogroup",
    # two more loud-error rows observed in the r9 run
    "q_dedup_semantic", "q_join_bloom",
    # r13: new queries, same integer-cents contract — floor(value*100)
    # -> BIGINT raises CAST/overflow loudly on both engines (runmax
    # keeps null values in-stream but rejects non-finite ones the same
    # way; its null-boundary contract is proven by the NULL sweep, where
    # it must PASS)
    "q_window_hotkey_runsum",
    "q_window_hotkey_runmax",
    # The r9-era "genuine cross-engine semantics" pair was PINNED in r10
    # and is gone: q_agg_profile renders non-finite min/max as explicit
    # 'NaN'/'Infinity'/'-Infinity' tokens on both sides (printf is
    # engine-specific beyond digits), and q_sort_secondary's packed
    # struct carries an ordering-class field so NaN ranks greatest
    # (above +Inf, first under DESC — both engines' native semantics,
    # which bare negation broke).
}


def _salt(t: str, name: str, i: int, v):
    h = int(hashlib.md5(f"{t}:{name}:{i}".encode()).hexdigest()[:4], 16) % 100
    if h < 6:
        return float("nan")
    if h < 8:
        return float("inf")
    if h < 10:
        return float("-inf")
    return v


def build_nonfinite_fixture(dst: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        tab = pq.read_table(f"{SRC_SF}/{t}.parquet")
        cols = {}
        for name in tab.column_names:
            col = tab[name]
            if name in FLOATS:
                cols[name] = pa.array(
                    [
                        _salt(t, name, i, v) if v is not None else None
                        for i, v in enumerate(col.to_pylist())
                    ],
                    type=col.type,
                )
            elif name == "embedding":
                out = []
                for i, vec in enumerate(col.to_pylist()):
                    h = int(
                        hashlib.md5(f"{t}:emb:{i}".encode()).hexdigest()[:4], 16
                    ) % 100
                    if vec is not None and h < 5 and len(vec) > 2:
                        vec = list(vec)
                        vec[0] = float("nan")
                        vec[1] = float("inf")
                    out.append(vec)
                cols[name] = pa.array(out, type=col.type)
            else:
                cols[name] = col
        pq.write_table(pa.table(cols), f"{dst}/{t}.parquet")


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from boundary import replay_and_diff

    dst = os.path.join(tempfile.gettempdir(), "ljx_sf_nonfinite")
    return replay_and_diff(
        build_nonfinite_fixture, dst, EXPECTED_DIVERGENT, "non-finite"
    )


if __name__ == "__main__":
    raise SystemExit(main())

"""The declared-query registry: SURVEY.md §2's corpus, each entry a
PySpark implementation + DuckDB oracle (oracle.py runs the comparison).
"""

from __future__ import annotations

from hadoop_0_20_2_ljx_spark.queries.base import QueryDef  # noqa: F401


# Iteration-order priority (evidence rotation): the driver records EXACTLY
# the first 50 registry rows per round. Priority: (a) queries with NO
# driver row yet or whose implementation/oracle changed this round
# (unproven claims are worse than aging proofs), then (b) the
# oldest-evidence queries. Round 4 fronts: the 12 r3 additions that have
# no external row, 1 new query (bz2 splittable scan), 6 whose code
# changed this round (n-ary override extension, the four ADVICE-fix
# queries, and Q3's broadcast-policy fix — their prior proofs predate
# the change), then 25 of the 44 remaining r1-only names (6 more slots went to the
# self-audit's changed modules: kmeans/PQ/IVF signature changes and the
# multimodal media_type check invalidate those queries' r2/r3 proofs).
# The 19 r1-only names that miss the cut
# (q_sink_text_roundtrip .. q_dedup_jaccard below the marker) plus the
# r2-latest block rotate in r5, together with q_udf_pipes (added late
# in r4, sim-only — new/changed queries front first). Local pytest and tools/driver_sim.py
# re-prove ALL queries at sf0.01 every gate run regardless — the driver
# rows are the hard external signal, not the only signal. Correctness
# itself is order-independent (each query is self-contained).
_NEEDS_FRESH_EVIDENCE = [
    # (a1) r3 additions with NO external driver row yet
    "q_sink_zorder",  # Z-order (morton) layout write
    "q_agg_copurchase",  # market-basket co-occurrence top-k
    "q_graph_kcore",  # bounded k-core peeling
    "q_agg_item_sim",  # item-item cosine from co-occurrence
    "q_agg_wau",  # 7-day rolling distinct users
    "q_agg_scd2",  # SCD type-2 history build
    "q_agg_tpch_q6",  # TPC-H Q6 shape (full-pushdown scan)
    "q_agg_tpch_q18",  # TPC-H Q18 shape (agg-then-join + top-100)
    "q_sample_weighted",  # deterministic priority sampling
    "q_agg_gapfill",  # calendar gap-fill + forward fill
    "q_proj_unpivot",  # unpivot/melt via the Expand node
    "q_text_entropy",  # per-source token-entropy diversity monitor
    # (a2) new this round
    "q_scan_bz2_text",  # new r4: splittable bzip2 single-file scan
    # (a3) changed this round — prior proofs predate the change
    "q_join_override",  # extended to n-ary (3 sources), r1 proof stale
    "q_agg_tpch_q5",  # ADVICE fix: no forced broadcast of SF-linear dims
    "q_agg_outliers",  # ADVICE fix: DECIMAL(38,0) products, int64 budget
    "q_agg_drift_js",  # ADVICE fix: n_bins now enforced (least-clamp)
    "q_udf_cogroup",  # ADVICE fix: half-away-from-zero cent rounding
    "q_agg_tpch_q3",  # self-audit fix: no forced broadcast of customer
    # modules changed in the r4 self-audit (kmeans_lloyd/pq_train/
    # ivf_assign signatures; multimodal decode media_type check) — their
    # r2/r3 proofs predate the change, so they re-prove before the old set
    "q_embed_kmeans",
    "q_embed_pq",
    "q_embed_ivf",
    "q_embed_ivfpq",
    "q_multimodal_decode",
    "q_multimodal_features",
    "q_join_asof",  # changed r4: direction param touched the sweep's orderBy
    # (b) oldest external evidence (r1-only), file order; 32 fit in the 50
    "q_scan_text_count",
    "q_scan_kv_split",
    "q_scan_sample_filter",
    "q_scan_multi_input",
    "q_gen_random_writer",
    "q_gen_terasort",
    "q_proj_fieldsel",
    "q_proj_chain",
    "q_filter_grep",
    "q_filter_skipbad",
    "q_sort_keyfield",
    "q_sort_total_order",
    "q_sort_secondary",
    "q_top_tokens",
    "q_agg_wordcount",
    "q_agg_tpch_q1",
    "q_agg_minmax",
    "q_agg_distinct",
    "q_agg_histogram",
    "q_agg_multi",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_window_rank",
    "q_join_inner",
    # ---- 50-row cut line (q_join_full_outer displaced by q_join_asof)
    "q_join_full_outer",
    # ---- continued r5 queue: names below rotate to the front in r5 (with q_udf_pipes, q_agg_tpch_q4, q_agg_tpch_q10, q_sample_group_split, q_join_asof_fwd — new, sim-only) ----
    "q_join_3way",
    "q_join_broadcast",
    "q_join_semi_anti",
    "q_join_salted",
    "q_set_union",
    "q_set_distinct",
    "q_set_intersect_except",
    "q_sink_text_roundtrip",
    "q_sink_parquet_roundtrip",
    "q_sink_sorted_lookup",
    "q_sink_partitioned",
    "q_udf_scalar",
    "q_udf_histogram",
    "q_num_pi",
    "q_fn_json",
    "q_stream_tumbling",
    "q_stream_session",
    "q_dedup_exact",
    "q_dedup_jaccard",
]


def _build() -> dict[str, QueryDef]:
    registry: dict[str, QueryDef] = {}
    from hadoop_0_20_2_ljx_spark.queries import (
        agg,
        analytic,
        audit,
        core,
        curation,
        ext,
        join_set,
        sink,
        tpch,
        udf_misc,
    )

    for mod in (core, agg, join_set, sink, udf_misc, ext, analytic, curation, tpch, audit):
        for k, v in mod.QUERIES.items():
            if k in registry:
                raise ValueError(f"duplicate query name {k}")
            registry[k] = v
    missing = [k for k in _NEEDS_FRESH_EVIDENCE if k not in registry]
    if missing:
        raise ValueError(f"priority list references unknown queries: {missing}")
    front = {k: registry[k] for k in _NEEDS_FRESH_EVIDENCE}
    rest = {k: v for k, v in registry.items() if k not in front}
    return {**front, **rest}


REGISTRY: dict[str, QueryDef] = _build()

"""The declared-query registry: SURVEY.md §2's corpus, each entry a
PySpark implementation + DuckDB oracle (oracle.py runs the comparison).
"""

from __future__ import annotations

from hadoop_0_20_2_ljx_spark.queries.base import QueryDef  # noqa: F401


# Iteration-order priority (evidence rotation): the driver records EXACTLY
# the first 50 registry rows per round. Priority: (a) queries with NO
# driver row yet or whose implementation/oracle changed this round
# (unproven claims are worse than aging proofs), then (b) the
# oldest-evidence queries. After round 6 every query carries a green
# external row (newest: 50 r6 / 49 r5 / 45 r4 / 39 r3 — recomputed from
# CORRECTNESS_r01..06; the r6-era "11 remaining r3 names" note was a
# miscount the r6 verdict corrected). Local pytest and
# tools/driver_sim.py re-prove ALL queries at sf0.01 every gate run
# regardless — the driver rows are the hard external signal, not the
# only signal. Correctness itself is order-independent (each query is
# self-contained).
_NEEDS_FRESH_EVIDENCE = [
    # Round 8 window = exactly 50 names (the committed r8 block from the
    # r7 verdict): (a) new/changed this round — CAPPED AT 6 so all 44
    # r4-latest names fit; (b) ALL 44 r4-latest names (after r8 no
    # registry query's newest external row is older than r5); (c) filler
    # to 50 from the oldest remaining tier (r5-latest, alphabetical) —
    # free rotation, not counted against the cap.
    # (a) new this round — sim-only until the r8 driver row lands
    "q_embed_kmeans_ivf_bcast",  # new r8: trained centroids x array carrier
    # (b) all 44 r4-latest names
    "q_agg_copurchase",
    "q_agg_cube",
    "q_agg_distinct",
    "q_agg_drift_js",
    "q_agg_gapfill",
    "q_agg_histogram",
    "q_agg_minmax",
    "q_agg_multi",
    "q_agg_rollup",
    "q_agg_scd2",
    "q_agg_tpch_q1",
    "q_agg_tpch_q18",
    "q_agg_tpch_q3",
    "q_agg_tpch_q5",
    "q_agg_tpch_q6",
    "q_agg_wau",
    "q_agg_window_rank",
    "q_agg_wordcount",
    "q_embed_kmeans",
    "q_embed_pq",
    "q_filter_grep",
    "q_gen_random_writer",
    "q_gen_terasort",
    "q_join_asof",
    "q_join_inner",
    "q_join_override",
    "q_multimodal_decode",
    "q_multimodal_features",
    "q_proj_chain",
    "q_proj_fieldsel",
    "q_proj_unpivot",
    "q_sample_weighted",
    "q_scan_bz2_text",
    "q_scan_kv_split",
    "q_scan_multi_input",
    "q_scan_sample_filter",
    "q_scan_text_count",
    "q_sink_zorder",
    "q_sort_keyfield",
    "q_sort_secondary",
    "q_sort_total_order",
    "q_text_entropy",
    "q_top_tokens",
    "q_udf_cogroup",
    # (c) filler to 50: oldest tier (r5-latest), alphabetical
    "q_agg_deciles",
    "q_agg_grouping_sets",
    "q_agg_interval_merge",
    "q_agg_item_sim",
    "q_agg_tpch_q10",
    # ---- 50-row cut line ----
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

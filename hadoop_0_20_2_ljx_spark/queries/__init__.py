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
    # Round 11 window = exactly 50 names: the 12 r6-latest + all 38
    # r7-latest queries (recomputed from CORRECTNESS_r01..10 — the ages
    # partition 12 r6 / 38 r7 / 36 r8 / 50 r9 / 50 r10, so this window
    # IS the full r6+r7 tail; executing it raises the registry-wide
    # external-evidence floor to r8).
    #
    # Changed-budget accounting: ZERO beyond-aging changes this round so
    # far — this is a pure age rotation, exactly the block pre-committed
    # at the end of the r10 window. Any r11 query whose implementation
    # or oracle changes must be inserted at the head of this list in the
    # same commit as the change.
    #
    # (a) the 12 r6-latest names:
    "q_join_overlap",
    "q_join_range",
    "q_pack_sequences",
    "q_sample_domain_cap",
    "q_sample_stratified",
    "q_shuffle_global",
    "q_sink_csv_json_roundtrip",
    "q_sink_named_outputs",
    "q_stream_interval_join",
    "q_stream_late_data",
    "q_text_redact",
    "q_text_tokens",
    # (b) the 38 r7-latest names (the entire r7 cohort):
    "q_agg_approx_distinct",
    "q_agg_cms",
    "q_agg_conversion",
    "q_agg_domain_mix",
    "q_agg_retention",
    "q_agg_rolling",
    "q_audit_constraints",
    "q_dedup_paragraph",
    "q_dedup_semantic",
    "q_embed_ann",
    "q_embed_ivf",
    "q_embed_ivf_bcast",
    "q_embed_ivf_nprobe",
    "q_embed_ivfpq",
    "q_embed_ivfpq_nprobe",
    "q_embed_ivfpq_rerank",
    "q_embed_kmeans_ivf",
    "q_embed_knn",
    "q_filter_blocklist",
    "q_filter_skipbad",
    "q_fn_recordio",
    "q_graph_triangles",
    "q_join_bloom",
    "q_sample_domain_reweight",
    "q_sample_temperature",
    "q_scan_gzip_text",
    "q_sink_compaction",
    "q_sink_har_roundtrip",
    "q_sink_orc_roundtrip",
    "q_sink_schema_evolution",
    "q_sink_tar_shards",
    "q_sink_tfile_roundtrip",
    "q_text_bm25",
    "q_text_bpe",
    "q_text_bpe_encode",
    "q_text_chunk",
    "q_text_inverted_index",
    "q_text_logprob",
    # ---- 50-row cut line ----
    # committed r12 block: after this window lands, the oldest cohort is
    # the 36 r8-latest names (q_agg_copurchase, q_agg_cube,
    # q_agg_distinct, q_agg_gapfill, q_agg_histogram, q_agg_multi,
    # q_agg_rollup, q_agg_tpch_q1, q_agg_tpch_q18, q_agg_tpch_q3,
    # q_agg_tpch_q5, q_agg_tpch_q6, q_agg_wau, q_agg_wordcount,
    # q_dedup_jaccard, q_dedup_substring, q_embed_kmeans,
    # q_embed_kmeans_ivf_bcast, q_embed_pq, q_join_inner,
    # q_join_override, q_pipeline_funnel, q_pipeline_training,
    # q_sample_token_budget, q_sink_zorder, q_sort_total_order,
    # q_text_bigram_lm, q_text_boilerplate, q_text_contamination,
    # q_text_decontaminate, q_text_fingerprint, q_text_langid,
    # q_text_quality, q_text_repetition, q_top_tokens,
    # q_udf_tokenize_udtf) + 14 of the 50 r9-latest names to fill 50,
    # plus whatever r12 adds or changes (changed queries take the head).
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

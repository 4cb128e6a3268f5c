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
    # Round 12 window = exactly 50 names: 1 changed-this-round query +
    # all 36 r8-latest + the 13 alphabetically-first r9-latest queries
    # (recomputed from CORRECTNESS_r01..11 — the ages partition 36 r8 /
    # 50 r9 / 50 r10 / 50 r11, so this window is the full r8 tail plus
    # the start of the r9 cohort; executing it raises the registry-wide
    # external-evidence floor to r9). The aging part is exactly the block
    # pre-committed at the end of the r11 window minus q_agg_tpch_q2,
    # displaced by the changed-query head slot.
    #
    # Changed-budget accounting: ONE beyond-aging change this round —
    # q_join_salted (salted_join's dim replica ids now come from
    # explode(sequence(...)), one expression node, instead of an
    # explode(array(lit...)) that stamps `buckets` literal nodes and hits
    # the ~10^3-literal parse cliff when buckets scales; row-identical,
    # re-proven vs the unchanged oracle) takes the head slot and
    # q_agg_tpch_q2 moves to the r13 block. Any further r12 change must
    # also be inserted at the head in the same commit as the change.
    #
    # (head) changed this round:
    "q_join_salted",
    # (a) the 36 r8-latest names (the entire r8 cohort):
    "q_agg_copurchase",
    "q_agg_cube",
    "q_agg_distinct",
    "q_agg_gapfill",
    "q_agg_histogram",
    "q_agg_multi",
    "q_agg_rollup",
    "q_agg_tpch_q1",
    "q_agg_tpch_q18",
    "q_agg_tpch_q3",
    "q_agg_tpch_q5",
    "q_agg_tpch_q6",
    "q_agg_wau",
    "q_agg_wordcount",
    "q_dedup_jaccard",
    "q_dedup_substring",
    "q_embed_kmeans",
    "q_embed_kmeans_ivf_bcast",
    "q_embed_pq",
    "q_join_inner",
    "q_join_override",
    "q_pipeline_funnel",
    "q_pipeline_training",
    "q_sample_token_budget",
    "q_sink_zorder",
    "q_sort_total_order",
    "q_text_bigram_lm",
    "q_text_boilerplate",
    "q_text_contamination",
    "q_text_decontaminate",
    "q_text_fingerprint",
    "q_text_langid",
    "q_text_quality",
    "q_text_repetition",
    "q_top_tokens",
    "q_udf_tokenize_udtf",
    # (b) the 13 alphabetically-first r9-latest names:
    "q_agg_deciles",
    "q_agg_interval_merge",
    "q_agg_minmax",
    "q_agg_scd2",
    "q_agg_tpch_q10",
    "q_agg_tpch_q11",
    "q_agg_tpch_q12",
    "q_agg_tpch_q13",
    "q_agg_tpch_q14",
    "q_agg_tpch_q15",
    "q_agg_tpch_q16",
    "q_agg_tpch_q17",
    "q_agg_tpch_q19",
    # ---- 50-row cut line ----
    # committed r13 block: after this window lands, the oldest cohort is
    # the 37 remaining r9-latest names (q_agg_tpch_q2 — displaced from
    # the r12 window by the q_join_salted change — plus q_agg_tpch_q20,
    # q_agg_tpch_q21, q_agg_tpch_q22, q_agg_tpch_q4, q_agg_tpch_q7,
    # q_agg_tpch_q8, q_agg_tpch_q9, q_agg_window_funcs, q_agg_window_rank,
    # q_agg_winsorize, q_corpus_source_sim, q_dedup_clusters,
    # q_dedup_exact, q_dedup_incremental, q_dedup_jaccard_est,
    # q_dedup_minhash, q_filter_grep, q_fn_json, q_gen_random_writer,
    # q_gen_terasort, q_join_asof, q_join_asof_fwd, q_multimodal_decode,
    # q_multimodal_features, q_proj_chain, q_proj_fieldsel,
    # q_proj_unpivot, q_scan_bz2_text, q_scan_kv_split,
    # q_scan_multi_input, q_scan_sample_filter, q_scan_text_count,
    # q_sort_keyfield_offsets, q_stream_session, q_stream_tumbling,
    # q_udf_histogram) + 13 of the 50 r10-latest names to fill 50, plus
    # whatever r13 adds or changes (changed queries take the head).
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

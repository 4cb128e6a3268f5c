"""The declared-query registry: SURVEY.md §2's corpus, each entry a
PySpark implementation + DuckDB oracle (oracle.py runs the comparison).
"""

from __future__ import annotations

from hadoop_0_20_2_ljx_spark.queries.base import QueryDef  # noqa: F401


# Iteration-order priority (evidence rotation): the driver records EXACTLY
# the first 50 registry rows per round. Priority: (a) queries with NO
# driver row yet or whose implementation/oracle changed this round
# (unproven claims are worse than aging proofs), then (b) the
# oldest-evidence queries. After round 5 every query carries a green
# external row (newest: 50 r5 / 48 r4 / 41 r3 / 34 r2). Local pytest and
# tools/driver_sim.py re-prove ALL queries at sf0.01 every gate run
# regardless — the driver rows are the hard external signal, not the
# only signal. Correctness itself is order-independent (each query is
# self-contained).
_NEEDS_FRESH_EVIDENCE = [
    # Round 6 window = exactly 50 names: (a) the 10 new + 6 changed
    # this round, (b) the committed r6 block — ALL 34 r2-latest names
    # (every registry query's newest external row becomes r3+ after
    # this round). The round's additions consumed every spare slot, so
    # all 11 r3-latest names moved whole into the committed r7 block
    # below the cut line.
    # (a1) new this round — sim-only until the r6 driver row lands
    "q_embed_ivf_nprobe",  # new r6: multi-probe IVF (recall/cost knob)
    "q_embed_ivfpq_nprobe",  # new r6: multi-probe composed with PQ codes
    "q_sample_domain_cap",  # new r6: per-domain quota cap (WindowGroupLimit)
    "q_sample_token_budget",  # new r6: global token-budget curation cut
    "q_corpus_source_sim",  # new r6: source-pair MinHash/exact Jaccard matrix
    "q_text_decontaminate",  # new r6: span-REMOVAL decontamination
    "q_corpus_dataset_card",  # new r6: per-source one-scan datasheet
    "q_sample_domain_reweight",  # new r6: computed-rate mixture reweighting
    "q_agg_drift_ks",  # new r6: exact binless KS slice-drift per group
    "q_embed_ivfpq_rerank",  # new r6: FAISS refine stage (exact re-rank)
    # (a2) changed this round — prior proofs predate the change
    "q_agg_outliers",  # r6: z^2 10^4 scaling now conditional (ADVICE)
    "q_graph_kcore",  # r6: alive-count probe hoisted out of the loop
    "q_graph_pagerank",  # r6: phase_seconds instrumentation hook
    "q_dedup_keep_latest",  # r6: cdc self-overwrite pin routed via pin()
    "q_filter_skipbad",  # r6: pid-suffixed scratch dir (concurrent gates)
    "q_embed_ivfpq",  # r6: nprobe param threaded through (nprobe=1 plan stable)
    # (b) the committed r6 block: all 34 r2-latest names, file order
    "q_agg_pivot",
    "q_agg_numeric_hist",
    "q_agg_stats",
    "q_agg_string_agg",
    "q_agg_hot_keys",
    "q_agg_profile",
    "q_agg_median_mode",
    "q_agg_daily",
    "q_agg_window_funcs",
    "q_sink_named_outputs",
    "q_sink_csv_json_roundtrip",
    "q_udf_tokenize_udtf",
    "q_fn_pentomino",
    "q_stream_late_data",
    "q_stream_interval_join",
    "q_dedup_simhash",
    "q_dedup_simhash_pairs",
    "q_dedup_embed",
    "q_text_langid",
    "q_text_quality",
    "q_text_tokens",
    "q_text_fingerprint",
    "q_text_redact",
    "q_pipeline_training",
    "q_text_repetition",
    "q_text_contamination",
    "q_dedup_fuzzy",
    "q_text_boilerplate",
    "q_sample_stratified",
    "q_pack_sequences",
    "q_embed_quantize",
    "q_shuffle_global",
    "q_join_range",
    "q_join_overlap",
    # (c) the round's 10 new + 6 changed additions displaced all 11
    # oldest r3-latest names into the r7 block; the 34-name r2 block
    # stays whole (the committed rotation promise outranks r3 aging)
    # ---- 50-row cut line ----
    # committed r7 block: the remaining r3-latest names
    # (q_agg_cms, q_join_bloom,
    # q_scan_gzip_text, q_sink_tar_shards, q_sink_har_roundtrip,
    # q_sink_schema_evolution, q_sink_compaction, q_sink_orc_roundtrip,
    # q_sink_tfile_roundtrip, q_fn_recordio, q_dedup_substring, then
    # q_text_classifier through q_agg_approx_quantile in SURVEY §8's Ext
    # column), plus any query added/changed in r7.
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

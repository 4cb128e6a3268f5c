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
    # Round 7 window = exactly 50 names: (a) the 2 new + 9 changed this
    # round (the r6 verdict capped r7 new/changed at 11 so the whole
    # r3 block fits — exactly met), (b) ALL 39 r3-latest names — after
    # r7 no registry query's newest external row is older than r4.
    # (a1) new this round — sim-only until the r7 driver row lands
    "q_embed_kmeans_ivf",  # new r7: trained kmeans centroids -> IVF probe
    "q_embed_ivf_bcast",  # new r7: array-column centroid path vs the IVF oracle
    # (a2) changed this round — prior proofs predate the change
    "q_agg_drift_ks",  # r7: one-sided groups now dropped (ADVICE)
    "q_sample_domain_reweight",  # r7: backslash-safe key literals (ADVICE)
    "q_filter_skipbad",  # r7: scratch dir atexit-cleaned (ADVICE)
    "q_corpus_source_sim",  # r7: max_shingle_freq cap param (default = unchanged)
    "q_embed_ivf",  # r7: similarity.py centroid scorer refactor (parity-pinned)
    "q_embed_ivf_nprobe",  # r7: same refactor (ivf_probe_lists paths)
    "q_embed_ivfpq",  # r7: ivf_assign literal/array path split
    "q_embed_ivfpq_nprobe",  # r7: same refactor
    "q_embed_ivfpq_rerank",  # r7: same refactor (stage 1 is ivfpq_ann)
    # (b) the committed r7 block: all 39 r3-latest names
    "q_agg_cms",
    "q_join_bloom",
    "q_scan_gzip_text",
    "q_sink_tar_shards",
    "q_sink_har_roundtrip",
    "q_sink_schema_evolution",
    "q_sink_compaction",
    "q_sink_orc_roundtrip",
    "q_sink_tfile_roundtrip",
    "q_fn_recordio",
    "q_dedup_substring",
    "q_text_classifier",
    "q_text_bigram_lm",
    "q_text_chunk",
    "q_agg_domain_mix",
    "q_dedup_minhash",
    "q_dedup_clusters",
    "q_embed_knn",
    "q_embed_ann",
    "q_text_logprob",
    "q_sample_temperature",
    "q_text_inverted_index",
    "q_text_bm25",
    "q_agg_approx_distinct",
    "q_dedup_jaccard_est",
    "q_agg_retention",
    "q_agg_conversion",
    "q_text_bpe",
    "q_dedup_semantic",
    "q_pipeline_funnel",
    "q_text_bpe_encode",
    "q_agg_rolling",
    "q_graph_triangles",
    "q_dedup_canonical",
    "q_dedup_paragraph",
    "q_dedup_incremental",
    "q_filter_blocklist",
    "q_agg_approx_quantile",
    "q_audit_constraints",
    # ---- 50-row cut line ----
    # committed r8 block: the remaining r4-latest names (the 44 not
    # pulled forward above — SURVEY §8's Ext column lists them), plus
    # any query added/changed in r8.
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

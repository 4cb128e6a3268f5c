"""The declared-query registry: SURVEY.md §2's corpus, each entry a
PySpark implementation + DuckDB oracle (oracle.py runs the comparison).
"""

from __future__ import annotations

from hadoop_0_20_2_ljx_spark.queries.base import QueryDef  # noqa: F401


# Iteration-order priority (evidence rotation): the driver records EXACTLY
# the first 50 registry rows per round (r01 and r02 each hold 50).
# Priority: (a) queries with NO driver row yet or whose implementation/
# oracle changed this round (unproven claims are worse than aging proofs),
# then (b) the oldest-evidence r1-only queries. Round 3 fronts exactly 50
# (a) entries (40 new + the 10 reworked whose r2 proofs predate their
# changes); 12 late-round simple additions are deferred to r4 along with
# the whole r1-only set — r4 MUST front those 12 + the 44 r1-only names
# before anything new so every query's driver proof is at most two
# rounds old. Local pytest and tools/
# driver_sim.py re-prove ALL queries at sf0.001/sf0.01/sf0.1 every gate
# run regardless — the driver rows are the hard external signal, not the
# only signal. Correctness itself is order-independent (each query is
# self-contained).
_NEEDS_FRESH_EVIDENCE = [
    # (a) changed/new this round — first-time or re-proof required
    "q_text_bpe",  # new: distributed BPE merge learning
    "q_text_bpe_encode",  # new: BPE corpus encoding + token accounting
    "q_agg_rolling",  # new: time-range rolling window aggregate
    "q_dedup_semantic",  # new: SemDeDup kmeans-blocked cosine dedup
    "q_pipeline_funnel",  # new: curation funnel accounting
    "q_dedup_jaccard_est",  # new: minhash estimate vs exact Jaccard
    "q_agg_retention",  # new: cohort retention matrix
    "q_agg_conversion",  # new: ordered conversion funnel
    "q_graph_pagerank",  # new: integer-exact iterative PageRank
    "q_dedup_canonical",  # new: canonicalizing keep-best dedup
    "q_dedup_paragraph",  # new: C4-style chunk-level first-occurrence dedup
    "q_dedup_incremental",  # new: new-batch-vs-index LSH dedup
    "q_filter_blocklist",  # new: deny-list filtering funnel
    "q_agg_approx_quantile",  # new: rank-error-gated quantile sketch
    "q_sink_orc_roundtrip",  # new: ORC columnar roundtrip
    "q_sink_schema_evolution",  # new: mergeSchema generation read
    "q_sink_compaction",  # new: small-file compaction
    "q_scan_gzip_text",  # new: gzip TextInputFormat roundtrip
    "q_sink_har_roundtrip",  # new: Hadoop Archive wire compat
    "q_dedup_minhash",  # reworked: double-hash minhash family (1 md5/shingle)
    "q_agg_approx_distinct",  # reworked: rows-only -> relative-error gate
    "q_sink_tfile_roundtrip",  # new: TFile container wire compat
    "q_fn_recordio",  # extended: + binary wire form
    "q_text_chunk",  # new: context-window chunking
    "q_dedup_keep_latest",  # new: CDC keep-latest compaction
    "q_agg_domain_mix",  # new: domain-mix accounting
    "q_embed_ivfpq",  # new: composed IVF-PQ ANN
    "q_sink_tar_shards",  # new: tar training-shard export
    "q_text_bigram_lm",  # new: bigram LM table
    "q_dedup_substring",  # new: exact duplicate-substring spans
    "q_text_classifier",  # new: hashed linear quality classifier
    "q_agg_cms",  # new: Count-Min Sketch heavy hitters
    "q_agg_tpch_q3",  # new: TPC-H Q3 shape (broadcast dim + top-10)
    "q_agg_tpch_q5",  # new: TPC-H Q5 shape (6-table join, all dims broadcast)
    "q_text_inverted_index",  # new: capped postings-list build
    "q_graph_triangles",  # new: degree-oriented triangle counting
    "q_audit_constraints",  # new: Deequ-style constraint suite
    "q_agg_outliers",  # new: integer-exact z-score outliers
    "q_agg_drift_js",  # new: JS distribution drift in nano-units
    "q_udf_cogroup",  # new: cogrouped applyInPandas reduce-side join
    # reworked this round (large-star CC; kNN guard; SQL-expr rewrite of
    # the kmeans/PQ/IVF assignment builders; bloom probe refactor) — their
    # r2 proofs predate the change, so they re-prove before the old set
    "q_dedup_clusters",
    "q_embed_knn",
    "q_embed_kmeans",
    "q_embed_pq",
    "q_embed_ivf",
    "q_embed_ann",
    "q_join_bloom",
    # single-scan rewrites (checkpointed side tables — tf/vocab/group
    # counts were recomputed per consumer, re-scanning the corpus 3x)
    "q_text_bm25",
    "q_text_logprob",
    "q_sample_temperature",
    # new this round but deferred to r4 evidence (driver records exactly 50
    # rows; the reworked block above must stay inside it — stale proofs on
    # changed code outrank first-time rows for simple, pytest-oracle-covered
    # queries). All three are partition-invariance-tested and green in the
    # in-repo driver sim at sf0.01 and sf0.1.
    "q_sink_zorder",  # new: Z-order (morton) layout write
    "q_agg_copurchase",  # new: market-basket co-occurrence top-k
    "q_graph_kcore",  # new: bounded k-core peeling
    "q_agg_item_sim",  # new: item-item cosine from co-occurrence
    "q_agg_wau",  # new: 7-day rolling distinct users
    "q_agg_scd2",  # new: SCD type-2 history build
    "q_agg_tpch_q6",  # new: TPC-H Q6 shape (full-pushdown scan)
    "q_agg_tpch_q18",  # new: TPC-H Q18 shape (agg-then-join + top-100)
    "q_sample_weighted",  # new: deterministic priority sampling
    "q_agg_gapfill",  # new: calendar gap-fill + forward fill
    "q_proj_unpivot",  # new: unpivot/melt via the Expand node
    "q_text_entropy",  # new: per-source token-entropy diversity monitor
    # (b) r1-only evidence, oldest proofs in the registry
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
    "q_join_full_outer",
    "q_join_override",
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

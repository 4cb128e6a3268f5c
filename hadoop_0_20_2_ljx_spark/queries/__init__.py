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
    # Round 8 window = exactly 50 names. The r7 verdict's committed plan
    # (<=6 new/changed + all 44 r4-latest) was OVERRIDDEN mid-round by a
    # discovered scale bug: Catalyst does no CSE inside higher-order-
    # function lambdas, so the three shared gram builders
    # (dedup.word_shingles, pipeline_ops.word_ngrams,
    # textstats.doc_fingerprint) re-ran the regexp tokenizer once per
    # gram — O(tokens^2) per document, 57x slower on 2000-token docs
    # (invisible on short fixture text, fatal on real web pages). The
    # bind-once fix is bitwise-identical (tests/test_hof_binding.py) but
    # changes 14 registry queries' plans; per this file's standing
    # priority — changed-this-round before aging proofs — all 14 front,
    # pushing 9 of the 44 r4-latest names to r9 (listed at the bottom;
    # all nine are r1/r2-era scan/generator/projection queries that are
    # additionally pinned by tests/test_sources.py, test_operators.py
    # and the every-round terasort bench).
    # (a) new this round — sim-only until the r8 driver row lands
    "q_embed_kmeans_ivf_bcast",  # new r8: trained centroids x array carrier
    # (b) changed this round: the 14 gram-builder consumers
    "q_dedup_minhash",  # r8: word_shingles bind-once (bitwise-identical)
    "q_dedup_clusters",  # r8: same
    "q_dedup_incremental",  # r8: same
    "q_dedup_jaccard",  # r8: same
    "q_dedup_jaccard_est",  # r8: same (also direct word_shingles use)
    "q_corpus_source_sim",  # r8: same
    "q_text_boilerplate",  # r8: same
    "q_text_repetition",  # r8: word_ngrams bind-once
    "q_text_contamination",  # r8: same
    "q_text_decontaminate",  # r8: same
    "q_dedup_substring",  # r8: same
    "q_pipeline_funnel",  # r8: same
    "q_text_bigram_lm",  # r8: same
    "q_text_fingerprint",  # r8: doc_fingerprint bind-once
    # (b2) changed late-r8: the same no-CSE-through-HOF-trees bug in the
    # lang-ID/quality score expressions — one `toks` Column object
    # referenced from every per-language score and every score referenced
    # three times by the argmax chain stamped 24 copies of
    # filter(split(lower(text))) into q_text_langid's projection (52 into
    # q_pipeline_training, which ALSO re-ran the dedup agg once per
    # feature-join branch — now a single projection, zero joins). Bind-
    # once rewrite is bitwise-identical (tests/test_hof_binding.py); four
    # more r4-latest names demoted to the committed r9 block.
    "q_text_langid",  # r8: lang scores + argmax bound once (24 -> 1 split)
    "q_text_quality",  # r8: token array + length fold bound once
    "q_pipeline_training",  # r8: one-projection compose, no feature joins
    "q_sample_token_budget",  # r8: quality_expr consumer (ordering key)
    # (b3) changed late-r8: the UDTF tokenizer used Python str.split()
    # (UNICODE whitespace — splits NBSP/ideographic space), silently
    # diverging from the engine-wide \s+ contract on non-ASCII text;
    # now the explicit [ \t\n\x0b\f\r]+ class (fixture output identical;
    # tests/test_unicode_boundary.py pins the path agreement)
    "q_udf_tokenize_udtf",  # r8: UDTF tokenizer aligned to \s+ contract
    # (c) 30 of the 44 r4-latest names
    "q_agg_copurchase",
    "q_agg_cube",
    "q_agg_distinct",
    "q_agg_drift_js",  # r8: oracle twin empty-slice guard (engine unchanged)
    "q_agg_gapfill",
    "q_agg_histogram",
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
    "q_join_asof",
    "q_join_inner",
    "q_join_override",
    "q_sample_weighted",
    "q_sink_zorder",
    "q_sort_keyfield",
    "q_sort_secondary",
    "q_sort_total_order",
    "q_text_entropy",
    "q_top_tokens",
    "q_udf_cogroup",
    # ---- 50-row cut line ----
    # committed r9 block: the 9 r4-latest names displaced by the r8
    # gram-builder churn — q_gen_random_writer, q_gen_terasort,
    # q_proj_chain, q_proj_fieldsel, q_scan_bz2_text, q_scan_kv_split,
    # q_scan_multi_input, q_scan_sample_filter, q_scan_text_count —
    # plus the 4 displaced by the late-r8 lang/quality binding fix
    # (q_agg_minmax, q_filter_grep, q_multimodal_decode,
    # q_multimodal_features; all four also pinned by unit tests), plus
    # q_proj_unpivot displaced by the UDTF tokenizer alignment (its
    # Expand-node plan is pinned in the sim + queries/ext tests) —
    # plus whatever r9 adds or changes.
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

"""The declared-query registry: SURVEY.md §2's corpus, each entry a
PySpark implementation + DuckDB oracle (oracle.py runs the comparison).
"""

from __future__ import annotations

from hadoop_0_20_2_ljx_spark.queries.base import QueryDef  # noqa: F401


# Iteration-order priority (evidence rotation): the driver records EXACTLY
# the first 50 registry rows per round. Priority: (a) queries with NO
# driver row yet or whose implementation/oracle changed this round
# (unproven claims are worse than aging proofs), then (b) the
# oldest-evidence queries. Round 5 fronts: the 21 new queries (the 15
# remaining TPC-H shapes completing Q1-Q22, plus table-diff /
# fingerprint / winsorize reconciliation-and-robust-stats), the 5 r4
# additions that have only sim evidence, 2 whose code changed this
# round (outliers' z^2 fixed-point ADVICE fix; item_sim's unhinted
# frequency re-entry — their r4 proofs predate the change), then ALL
# 20 r1-only names, then the 2 oldest r2-latest names that fit. After
# r5 every query has an external row and none is older than r2; the 34
# r2 names below the cut line are the committed r6 block. Local pytest and
# tools/driver_sim.py re-prove ALL queries at sf0.01 every gate run
# regardless — the driver rows are the hard external signal, not the
# only signal. Correctness itself is order-independent (each query is
# self-contained).
_NEEDS_FRESH_EVIDENCE = [
    # (a1) new this round
    "q_agg_tpch_q2",  # new r5: correlated scalar-agg decorrelation shape
    "q_agg_tpch_q19",  # new r5: OR-of-ANDs disjunctive join predicate
    "q_agg_tpch_q16",  # new r5: NOT IN -> anti-join + count-distinct
    "q_agg_tpch_q14",  # new r5: conditional-agg ratio (integer ppm)
    "q_agg_tpch_q13",  # new r5: outer-join double-agg distribution
    "q_agg_tpch_q17",  # new r5: correlated AVG self-decorrelation
    "q_agg_tpch_q21",  # new r5: EXISTS/NOT-EXISTS inequality-correlation
    "q_agg_tpch_q22",  # new r5: global scalar avg + anti-join
    "q_agg_tpch_q7",  # new r5: symmetric nation-pair disjunction
    "q_agg_tpch_q8",  # new r5: grouped conditional-ratio market share
    "q_agg_tpch_q9",  # new r5: widest join tree + cost surrogate
    "q_agg_tpch_q11",  # new r5: per-group agg vs global scalar (HAVING)
    "q_agg_tpch_q12",  # new r5: join + two conditional counts
    "q_agg_tpch_q15",  # new r5: argmax equality re-join
    "q_agg_tpch_q20",  # new r5: nested-IN semi-join chain
    "q_audit_table_diff",  # new r5: keyed snapshot reconciliation
    "q_audit_fingerprint",  # new r5: anti-entropy bucket hash-sum
    "q_agg_winsorize",  # new r5: exact-order-statistic clipping
    "q_audit_diff_incremental",  # new r5: dirty-bucket-pruned diff
    "q_agg_interval_merge",  # new r5: interval union / coverage
    "q_agg_deciles",  # new r5: exact ceil-rank decile bands
    # (a2) r4 additions with NO external driver row yet (sim-only)
    "q_udf_pipes",  # external-process line protocol, oracle-gated
    "q_join_asof_fwd",  # forward as-of join (next event at-or-after)
    "q_sample_group_split",  # group-aware leakage-safe split
    "q_agg_tpch_q4",  # TPC-H Q4 shape (EXISTS -> left-semi)
    "q_agg_tpch_q10",  # TPC-H Q10 shape (agg-then-join top-20)
    # (a3) changed this round — prior proofs predate the change
    "q_agg_outliers",  # ADVICE fix: z^2 in 10^-4 fixed point
    "q_agg_item_sim",  # broadcast policy: frequency re-entry unhinted
    # (b) oldest external evidence — all 20 r1-only names, file order
    "q_join_full_outer",
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
    # (c) oldest r2-latest names, file order; 2 fit in the 50
    "q_sort_keyfield_offsets",
    "q_agg_grouping_sets",
    # ---- 50-row cut line ----
    "q_agg_pivot",
    "q_agg_numeric_hist",
    "q_agg_stats",
    "q_agg_string_agg",
    "q_agg_hot_keys",
    "q_agg_profile",
    "q_agg_median_mode",
    # committed r6 block: ALL 34 r2-latest names below the cut (from
    # q_agg_pivot above through q_join_overlap, plus any query
    # added/changed in r6). Seventeen r2 names moved below the cut
    # as 11 further TPC-H shapes + 6 reconciliation/coverage queries landed —
    # new unproven queries outrank aging r2 proofs; every name below
    # keeps its green r2 row.
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

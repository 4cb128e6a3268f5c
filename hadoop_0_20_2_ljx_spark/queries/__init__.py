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
    # Round 13 window = exactly 50 names: 1 changed-this-round query +
    # the entire 37-name r9-latest cohort + the 12 alphabetically-first
    # r10-latest names (recomputed from CORRECTNESS_r01..12 — ages
    # partition 37 r9 / 49 r10 / 50 r11 / 50 r12; executing this window
    # raises the registry-wide external-evidence floor to r10). This is
    # the block pre-committed at the end of the r12 window, minus
    # q_agg_stats (the 13th r10 name), displaced by the changed-query
    # head slot.
    #
    # Changed-budget accounting: THREE beyond-aging insertions this
    # round — q_window_hotkey_runsum (NEW query: the decomposable window
    # hot-key path, chunked_running_sum — unproven claims outrank aging
    # proofs; later in r13 the operator generalized to
    # chunked_running_agg [sum/count/min/max with identity-correct
    # offset combines], which also FIXED the sum path's null-value
    # contract — an all-null chunk no longer poisons a non-null prefix —
    # so the head slot covers that change too), q_window_hotkey_runmax
    # (NEW query, same commit as the generalization: the agg="max"
    # least/greatest combine path proven against the direct-window
    # oracle with null values kept in-stream; still later the chunk
    # monotonicity contract became VERIFIED — per-chunk order-key ranges
    # ride the offsets groupBy and an adjacent-range overlap raises
    # through the _off expression instead of silently corrupting
    # prefixes — same plan shapes, offsets exchange +16B/chunk-row),
    # and q_join_salted
    # (salted_join/salted_sum now raise ValueError for
    # buckets < 1 instead of silently returning empty: sequence(0, -1)
    # auto-steps to [0, -1] on the dim side while pmod(x, 0) NULLs the
    # fact-side salt — r12 ADVICE item 1; no plan or result change for
    # any valid buckets; later in r13 all three skew operators also
    # gained working-column collision guards — a user column named
    # _salt/_chunk/... was silently overwritten then dropped — again
    # driver-side validation only, no plan change). Each displaces one
    # r10 tail name. Any further
    # r13 change must also be inserted at the head in the same commit.
    #
    # r13 OPTIMIZATION-round head slots (each displaces one r10 tail
    # name; results oracle-identical by design, but changed plans are
    # unproven claims until externally re-proven): q_join_bloom (bloom
    # probe rewritten pandas-UDF -> JVM getbit over a single-literal
    # word bitmap, positions md5 -> xxhash64 — engine-internal bits),
    # q_agg_copurchase (distinct + equi-self-join -> per-order sorted
    # membership sets, pairs enumerated partition-locally),
    # q_audit_diff_incremental (internal fingerprint/bucket hashes
    # md5 -> xxhash64; the declared oracle is the plain full-diff SQL),
    # q_embed_kmeans and q_embed_pq (Lloyd/PQ per-dim agg lists built as
    # one parsed SQL struct per round instead of O(dim) py4j Column
    # calls — plan diff is expression-ids only, results bit-identical;
    # q_corpus_source_sim, the round's other reshape, already sits in
    # the r9 cohort below).
    #
    # (head) new / changed this round:
    "q_join_bloom",
    "q_agg_copurchase",
    "q_audit_diff_incremental",
    "q_embed_kmeans",
    "q_embed_pq",
    "q_window_hotkey_runsum",
    "q_window_hotkey_runmax",
    "q_join_salted",
    # (a) the 37 r9-latest names (the entire r9 cohort):
    "q_agg_tpch_q2",
    "q_agg_tpch_q20",
    "q_agg_tpch_q21",
    "q_agg_tpch_q22",
    "q_agg_tpch_q4",
    "q_agg_tpch_q7",
    "q_agg_tpch_q8",
    "q_agg_tpch_q9",
    "q_agg_window_funcs",
    "q_agg_window_rank",
    "q_agg_winsorize",
    "q_corpus_source_sim",
    "q_dedup_clusters",
    "q_dedup_exact",
    "q_dedup_incremental",
    "q_dedup_jaccard_est",
    "q_dedup_minhash",
    "q_filter_grep",
    "q_fn_json",
    "q_gen_random_writer",
    "q_gen_terasort",
    "q_join_asof",
    "q_join_asof_fwd",
    "q_multimodal_decode",
    "q_multimodal_features",
    "q_proj_chain",
    "q_proj_fieldsel",
    "q_proj_unpivot",
    "q_scan_bz2_text",
    "q_scan_kv_split",
    "q_scan_multi_input",
    "q_scan_sample_filter",
    "q_scan_text_count",
    "q_sort_keyfield_offsets",
    "q_stream_session",
    "q_stream_tumbling",
    "q_udf_histogram",
    # (b) the 5 alphabetically-first r10-latest names (q_agg_pivot etc.
    # displaced to r14 by the head slots — 3 build-phase + 5
    # optimization-phase):
    "q_agg_approx_quantile",
    "q_agg_daily",
    "q_agg_drift_js",
    "q_agg_drift_ks",
    "q_agg_grouping_sets",
    # ---- 50-row cut line ----
    # committed r14 block: after this window lands, the oldest cohort is
    # the 45 remaining r10-latest names (q_agg_hot_keys, q_agg_item_sim,
    # q_agg_median_mode, q_agg_numeric_hist, q_agg_outliers — displaced
    # from the r13 window by the optimization-phase head slots — plus
    # q_agg_pivot, q_agg_profile, q_agg_stats,
    # q_agg_retention, q_agg_rolling, q_agg_string_agg,
    # q_audit_constraints_violations, q_dedup_canonical and the rest of
    # the r10 cohort, recompute from CORRECTNESS_r01..13 at r14 start) +
    # 5 of the r11-latest names to fill 50, plus whatever r14 adds or
    # changes (changed queries take the head).
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

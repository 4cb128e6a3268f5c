"""Partition-count invariance: a query's VALUES must not depend on how
the data happens to be partitioned — the number-one cross-engine
determinism hazard (rand(), undeterministic tie-breaks, fold order over
partitions all break it, and none of them reproduce on the single-node
DuckDB oracle). A representative slice of the registry is executed at
two very different shuffle-partition settings and must fingerprint
identically."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F  # noqa: F401 (parity with sibling tests)

from hadoop_0_20_2_ljx_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE

# One per family: agg, window, join, temporal, dedup, ANN, text, sampling,
# packing, CDC, chunking, sort.
SAMPLE = [
    "q_agg_tpch_q1",
    "q_agg_window_funcs",
    "q_join_3way",
    "q_join_asof",
    "q_dedup_minhash",
    "q_embed_ivfpq",
    "q_text_chunk",
    "q_sample_stratified",
    "q_pack_sequences",
    "q_dedup_keep_latest",
    "q_sort_total_order",
    "q_agg_domain_mix",
    # round-3 additions: iterative (BPE argmax, integer PageRank),
    # keep-best tie-breaks, chunk first-occurrence winners, funnel flags
    "q_text_bpe",
    "q_graph_pagerank",
    "q_dedup_canonical",
    "q_dedup_paragraph",
    "q_pipeline_funnel",
    "q_agg_rolling",
    # this session's additions: top-k selections on integer-cent revenue,
    # degree-oriented triangles, integer-exact outlier boundary, nano-unit
    # drift/entropy sums, priority-sampling ranks, SCD2 interval closes,
    # cogrouped pandas merge
    "q_agg_tpch_q3",
    "q_graph_triangles",
    "q_agg_outliers",
    "q_agg_drift_js",
    "q_sample_weighted",
    "q_agg_scd2",
    "q_udf_cogroup",
    "q_text_entropy",
    "q_text_inverted_index",
    "q_agg_gapfill",
    "q_agg_copurchase",
    "q_graph_kcore",
    "q_agg_item_sim",
    "q_agg_wau",
]


def _fingerprint(df) -> str:
    cols = sorted(df.columns)
    rows = sorted(
        "|".join(repr(r[c]) for c in cols) for r in df.collect()
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


@pytest.mark.parametrize("name", SAMPLE)
def test_partition_count_invariance(spark, name):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _fingerprint(REGISTRY[name].spark(spark, SF_SMOKE))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _fingerprint(REGISTRY[name].spark(spark, SF_SMOKE))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b, f"{name} result depends on shuffle partition count"

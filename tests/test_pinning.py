"""Durability-mode switch for pinned working tables (pinning.pin).

local mode = localCheckpoint (fast, executor-loss fails the job);
durable mode = reliable checkpoint (replicated blocks, lineage truncated
— the production posture; kept lineage grew iterative plans 2^rounds).
The switch must be results-invariant: pinned tables are deterministic, so
both modes must produce byte-identical query output.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_0_20_2_ljx_spark.pinning import PIN_MODE_CONF, pin
from hadoop_0_20_2_ljx_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_pin_modes_materialize_identically(spark):
    src = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("g")
    )
    spark.conf.set(PIN_MODE_CONF, "local")
    try:
        local = pin(src.groupBy("g").agg(F.sum("id").alias("s")))
        assert not local.isStreaming
        spark.conf.set(PIN_MODE_CONF, "durable")
        durable = pin(src.groupBy("g").agg(F.sum("id").alias("s")))
        assert _rows(local) == _rows(durable)
        # durable = reliable checkpoint: lineage must be TRUNCATED (the
        # plan bottoms out at the checkpointed RDD, not the source) so
        # iterative callers' plans stay constant-size per round
        plan = durable._jdf.queryExecution().optimizedPlan().toString()
        assert "LogicalRDD" in plan or "ExistingRDD" in plan, plan
        assert spark.sparkContext.getCheckpointDir() is not None
    finally:
        spark.conf.unset(PIN_MODE_CONF)


def test_iterative_query_results_mode_invariant(spark):
    """Connected components (the heaviest pin consumer: a loop of
    large-star/small-star rounds, one pin per round) must return the
    exact same clusters under both modes."""
    name = "q_dedup_clusters"
    _run_mode_invariant(spark, name)


def test_kcore_mode_invariant(spark):
    """k-core references its pinned edge set TWICE per peeling round —
    the caller whose kept-lineage plan grew 2^rounds and OOMed the
    driver under the old persist-based durable mode (caught by the
    registry-wide durable sweep, r5). Must now run and match local
    mode exactly."""
    _run_mode_invariant(spark, "q_graph_kcore")


def _run_mode_invariant(spark, name):
    try:
        spark.conf.set(PIN_MODE_CONF, "local")
        local = _rows(REGISTRY[name].spark(spark, SF_SMOKE))
        spark.conf.set(PIN_MODE_CONF, "durable")
        durable = _rows(REGISTRY[name].spark(spark, SF_SMOKE))
    finally:
        spark.conf.unset(PIN_MODE_CONF)
    assert local == durable and len(local) > 0


def test_bm25_results_mode_invariant_and_timed(spark, capsys):
    """Second pin family: BM25's corpus-stat side tables (df/avgdl)
    materialize via pin before re-entering the scoring join. Both modes
    must score identically; the measured local overhead of the durable
    (production) posture is reported so SCALE.md can cite a number
    instead of asserting acceptability."""
    import time

    name = "q_text_bm25"
    walls = {}
    try:
        for mode in ("local", "durable"):
            spark.conf.set(PIN_MODE_CONF, mode)
            t0 = time.time()
            walls[mode] = (_rows(REGISTRY[name].spark(spark, SF_SMOKE)), time.time() - t0)
    finally:
        spark.conf.unset(PIN_MODE_CONF)
    (local_rows, t_local), (durable_rows, t_durable) = walls["local"], walls["durable"]
    assert local_rows == durable_rows and len(local_rows) > 0
    with capsys.disabled():
        print(
            f"\n[pin-mode overhead] bm25 sf-smoke: local={t_local:.2f}s "
            f"durable={t_durable:.2f}s (x{t_durable / max(t_local, 1e-9):.2f})"
        )

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The engine lives in ``hadoop_0_20_2_ljx_spark/``; the full declared-query
corpus (SURVEY.md §2 + §7.4 extensions) is the registry in
``hadoop_0_20_2_ljx_spark/queries/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's session settings to a driver-provided session
    (fixture timestamps are TIMESTAMP(NANOS): needs nanosAsLong; UTC keeps
    event-time queries oracle-comparable; ship_package makes UDF closures
    that reference engine modules importable on Python workers)."""
    from hadoop_0_20_2_ljx_spark.session import ship_package

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    ship_package(spark)
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H Q1-shape
    aggregation (Q-agg-2) — scan, arithmetic, partial+final aggregation."""
    from hadoop_0_20_2_ljx_spark.queries import REGISTRY

    _configure(spark)
    return REGISTRY["q_agg_tpch_q1"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §7.4)."""
    from hadoop_0_20_2_ljx_spark.queries import REGISTRY

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_configure(spark), sf_dir)

        return run

    return {name: wrap(qd.spark) for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted entries get the
    driver's weaker rows-only check — only q_agg_approx_distinct, whose
    HLL estimate is engine-specific)."""
    from hadoop_0_20_2_ljx_spark.queries import REGISTRY

    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}

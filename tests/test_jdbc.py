"""JDBC source/sink round trip against embedded Derby (ships in Spark's
jars for the Hive metastore, so this runs with no extra driver):
DBOutputFormat's batched INSERT write + DBInputFormat's partitioned read
(sources/jdbc.py), including predicate pushdown."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from hadoop_0_20_2_ljx_spark import catalog
from hadoop_0_20_2_ljx_spark.sources.jdbc import read_jdbc_partitioned, write_jdbc_batched
from tests.conftest import SF_SMOKE

DB_DIR = "/root/repo/.tmp/derbydb"
URL = f"jdbc:derby:{DB_DIR};create=true"
DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def test_jdbc_write_then_partitioned_read_roundtrip(spark):
    shutil.rmtree(DB_DIR, ignore_errors=True)
    src = (
        catalog.load(spark, SF_SMOKE, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(500)
    )
    write_jdbc_batched(
        src, URL, "orders_t", mode="overwrite", batch_size=100, driver=DRIVER
    )
    hi = src.agg(F.max("o_orderkey")).collect()[0][0]
    back = read_jdbc_partitioned(
        spark,
        URL,
        "orders_t",
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=int(hi) + 1,
        num_partitions=4,
        driver=DRIVER,
    )
    # the partitioned read really split the scan
    assert back.rdd.getNumPartitions() == 4
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert len(b) == len(a)
    assert all(x[0] == y[0] and x[1] == y[1] and abs(x[2] - y[2]) < 1e-6 for x, y in zip(a, b))


def test_jdbc_predicate_pushdown(spark):
    back = read_jdbc_partitioned(
        spark,
        URL,
        "orders_t",
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=10_000_000,
        num_partitions=2,
        # quoted: Spark's JDBC writer creates case-sensitive lowercase
        # columns, and Derby uppercases unquoted identifiers
        predicate='"o_custkey" <= 50',
        driver=DRIVER,
    )
    rows = back.collect()
    assert rows and all(r["o_custkey"] <= 50 for r in rows)


def test_dbcount_jdbc_end_to_end(spark):
    from hadoop_0_20_2_ljx_spark import jobs

    res = jobs.dbcount_jdbc(spark, "3000").collect()[0]
    assert res["verified"] is True
    assert res["n_access"] == 3000
    assert res["n_urls"] == 97

"""Bloom membership: no false negatives, sane FP rate, parquet blooms."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from hadoop_0_20_2_ljx_spark import catalog
from hadoop_0_20_2_ljx_spark.functions import bloom
from tests.conftest import SF_SMOKE

TMP = "/root/repo/.tmp/bloompq"


def test_bloom_prefilter_superset_of_semi_join(spark):
    li = catalog.load(spark, SF_SMOKE, "lineitem")
    orders = catalog.load(spark, SF_SMOKE, "orders").filter(F.col("o_orderkey") % 7 == 0)
    keys = orders.select(F.col("o_orderkey").alias("l_orderkey"))

    exact = li.join(keys, "l_orderkey", "left_semi")
    filtered = bloom.bloom_prefilter(
        li.withColumn("k", F.col("l_orderkey")), orders.withColumn("k", F.col("o_orderkey")), "k"
    )

    n_exact, n_bloom = exact.count(), filtered.count()
    # no false negatives: every truly-matching row survives
    missing = exact.join(filtered.select("l_orderkey").distinct(), "l_orderkey", "left_anti")
    assert missing.count() == 0
    # false positives bounded: superset, but not the whole table
    assert n_bloom >= n_exact
    assert n_bloom <= li.count() * 0.5


def test_bloom_exactness_after_join(spark):
    li = catalog.load(spark, SF_SMOKE, "lineitem").withColumn("k", F.col("l_orderkey"))
    orders = catalog.load(spark, SF_SMOKE, "orders").filter(F.col("o_orderkey") % 5 == 0)
    ok = orders.select(F.col("o_orderkey").alias("k"), "o_totalprice")
    plain = li.join(ok, "k").agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 4).alias("s"))
    pre = bloom.bloom_prefilter(li, ok, "k").join(ok, "k").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 4).alias("s")
    )
    assert tuple(plain.collect()[0]) == tuple(pre.collect()[0])


def test_parquet_bloom_roundtrip(spark):
    shutil.rmtree(TMP, ignore_errors=True)
    orders = catalog.load(spark, SF_SMOKE, "orders")
    bloom.write_parquet_with_bloom(orders, TMP, ["o_orderkey"], expected_ndv=10_000)
    back = spark.read.parquet(TMP)
    key = orders.select("o_orderkey").first()[0]
    assert back.filter(F.col("o_orderkey") == key).count() >= 1
    assert back.count() == orders.count()
    shutil.rmtree(TMP, ignore_errors=True)


def test_optimal_params_shape():
    m, k = bloom.optimal_params(10_000, 0.01)
    assert m > 10_000 and 5 <= k <= 10

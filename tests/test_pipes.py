"""External-process UDF (pipes/streaming compat): results equal the
equivalent built-in expressions."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_0_20_2_ljx_spark import catalog
from hadoop_0_20_2_ljx_spark.functions.pipes import pipe_records
from tests.conftest import SF_SMOKE


def test_pipe_uppercase_matches_builtin(spark):
    cust = catalog.load(spark, SF_SMOKE, "customer").select("c_custkey", "c_mktsegment")
    piped = pipe_records(
        cust, "tr '[:lower:]' '[:upper:]'", "c_custkey bigint, seg string"
    )
    expect = cust.select("c_custkey", F.upper("c_mktsegment").alias("seg"))
    assert sorted(map(tuple, piped.collect())) == sorted(map(tuple, expect.collect()))


def test_pipe_one_to_n_rows(spark):
    # streaming-mapper shape: awk splits each doc line into one line per word
    docs = catalog.load(spark, SF_SMOKE, "documents").select("text").limit(10)
    piped = pipe_records(docs, "tr ' ' '\\n'", "word string")
    expect = docs.select(F.explode(F.split("text", " ")).alias("word"))
    assert piped.count() == expect.count()
    assert sorted(r["word"] for r in piped.collect()) == sorted(
        r["word"] for r in expect.collect()
    )

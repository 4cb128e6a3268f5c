"""Training-pipeline extras: repetition, contamination, stratified
sampling, sequence packing (extensions/pipeline_ops.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_0_20_2_ljx_spark import catalog
from hadoop_0_20_2_ljx_spark.extensions import pipeline_ops
from tests.conftest import SF_SMOKE


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_repetition_score_bounds_and_exact_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b a b a b a b"), (3, "x y")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in pipeline_ops.repetition_score(df, "doc_id", "text", n=3).collect()
    }
    assert rows[1]["n_dup_ngrams"] == 0 and rows[1]["rep_frac"] == 0.0
    # 6 trigrams, only 2 distinct -> 4 duplicates
    assert rows[2]["n_ngrams"] == 6 and rows[2]["n_dup_ngrams"] == 4
    # shorter than n words -> zero ngrams, defined (not null/error)
    assert rows[3]["n_ngrams"] == 0 and rows[3]["rep_frac"] == 0.0


def test_contamination_flags_exact_dup_of_benchmark(spark):
    base = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, "totally different words without any overlap at all")],
        "doc_id long, text string",
    )
    bench = docs.filter(F.col("doc_id") == 0)
    train = docs.filter(F.col("doc_id") != 0)
    got = {
        r["doc_id"]: r["n_shared_ngrams"]
        for r in pipeline_ops.ngram_contamination(
            train, bench, "doc_id", "text", n=8
        ).collect()
    }
    # doc 1 duplicates the benchmark doc: all three 8-grams shared; doc 2 clean
    assert got == {1: 3}


def test_stratified_sample_is_deterministic_and_shuffle_free(spark):
    docs = catalog.load(spark, SF_SMOKE, "documents")
    rates = {"en": 0.5, "de": 0.0}
    s1 = pipeline_ops.stratified_sample(docs, "lang", rates, "doc_id")
    s2 = pipeline_ops.stratified_sample(docs, "lang", rates, "doc_id")
    ids1 = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
    assert ids1 == sorted(r["doc_id"] for r in s2.select("doc_id").collect())
    assert s1.filter(F.col("lang") == "de").count() == 0
    # stateless filter: no exchange anywhere in the sampling plan
    assert "Exchange" not in plan_of(s1)


def test_pack_sequences_matches_serial_packing(spark):
    docs = catalog.load(spark, SF_SMOKE, "documents")
    tok = docs.select(
        "doc_id", F.size(F.split("text", r"\s+")).cast("long").alias("n_tokens")
    )
    ctx = 256
    packed = {
        r["doc_id"]: r["bin_id"]
        for r in pipeline_ops.pack_sequences(tok, "doc_id", "n_tokens", ctx).collect()
    }
    acc = 0
    for r in sorted(tok.collect(), key=lambda r: r["doc_id"]):
        assert packed[r["doc_id"]] == acc // ctx
        acc += r["n_tokens"]
    # the packing never funnels data through a single partition
    assert "SinglePartition" not in plan_of(
        pipeline_ops.pack_sequences(tok, "doc_id", "n_tokens", ctx)
    )

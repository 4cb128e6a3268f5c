"""Pins for the r14 minhash SQL-text build rewrite.

minhash_signatures_relational's 16-seed aggregate list and
band_buckets_from_signatures' banded-struct array are now built as
parsed SQL text (F.expr) instead of per-Column py4j calls — the r6
literal-tree lesson applied to agg/struct lists (measured: 5,388 py4j
send_commands = 1.36 s of q_dedup_incremental's driver build collapsed
to ~1,470). The parsed trees must be IDENTICAL to the old Column-built
trees: these tests keep the pre-r14 forms verbatim and require the
optimized plan (modulo expression and lambda-variable ids, which are
session counters) and the produced rows to match bitwise.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from hadoop_0_20_2_ljx_spark.extensions import dedup

SF_SMOKE = "/root/testdata/sf0.001"


def _old_signatures_relational(df, id_col, text_col, num_hashes=16, shingle_k=3):
    """Pre-r14 minhash_signatures_relational, kept verbatim (the agg
    list built one Column per seed)."""
    ids = df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("_text"))
    sc = df.sparkSession.sparkContext
    spread = ids.repartition(sc.defaultParallelism, "doc")
    sh = dedup.word_shingles(F.col("_text"), shingle_k)
    padded = dedup._pad_empty(sh)
    hashed = spread.select("doc", F.explode(padded).alias("g")).select(
        "doc", dedup._mh_base(F.col("g")).alias("v")
    )
    return hashed.groupBy("doc").agg(
        *[F.min(dedup._mh_hash(F.col("v"), s)).alias(f"h{s}") for s in range(num_hashes)]
    )


def _old_band_buckets(sigd, num_hashes=16, bands=4):
    """Pre-r14 band_buckets_from_signatures, kept verbatim (the struct
    array built via Column operators)."""
    rows_per_band = num_hashes // bands
    return sigd.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        dedup._h32(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"h{b * rows_per_band + i}").cast("string")
                                    for i in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def _norm_plan(df) -> str:
    s = df._jdf.queryExecution().optimizedPlan().toString()
    s = re.sub(r"#\d+L?", "#X", s)  # expression ids
    # lambda variable NAMES are arbitrary (Column API mints x_<counter>,
    # SQL text uses the source names ws/i/a/w); semantics ride the
    # row-equality tests, this normalization compares tree SHAPE
    s = re.sub(r"lambda [A-Za-z_]\w*#X", "lambda VAR#X", s)
    s = re.sub(r"x_\d+", "x_N", s)
    return s


def test_sqltext_build_plans_are_identical(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    old = _old_band_buckets(_old_signatures_relational(docs, "doc_id", "text"))
    new = dedup.minhash_band_buckets(docs, "doc_id", "text")
    assert _norm_plan(old) == _norm_plan(new)


def test_sqltext_build_rows_are_identical(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    old = _old_band_buckets(_old_signatures_relational(docs, "doc_id", "text"))
    new = dedup.minhash_band_buckets(docs, "doc_id", "text")
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0


def test_sqltext_signatures_rows_identical_nondefault_params(spark):
    """Non-default (num_hashes, bands, shingle_k) exercise the SQL-text
    generators off the default path (seed constants, band slicing)."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    old = _old_band_buckets(
        _old_signatures_relational(docs, "doc_id", "text", num_hashes=12, shingle_k=2),
        num_hashes=12,
        bands=3,
    )
    new = dedup.minhash_band_buckets(
        docs, "doc_id", "text", num_hashes=12, bands=3, shingle_k=2
    )
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0

"""Unit tests for extensions/audit.py edge cases the oracle queries
don't reach: null handling, zero-variance groups, empty slices, and the
integer-exactness property of the outlier boundary."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_0_20_2_ljx_spark.extensions import audit


def test_completeness_counts_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], "id long, v string"
    )
    row = audit.completeness_check(df, "v", min_ppm=600_000).collect()[0]
    assert row["metric_ppm"] == 500_000
    assert row["passed"] is False


def test_uniqueness_detects_dupes(spark):
    df = spark.createDataFrame([(1,), (1,), (2,), (3,)], "k long")
    row = audit.uniqueness_check(df, "k").collect()[0]
    assert row["metric_ppm"] == 750_000
    assert row["passed"] is False


def test_referential_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (9,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = audit.referential_check(child, "fk", parent, "pk").collect()[0]
    assert row["metric_ppm"] == 500_000
    assert row["passed"] is False


def test_zscore_zero_variance_group_emits_nothing(spark):
    # all-equal group: variance 0 — no row may divide by zero or appear
    df = spark.createDataFrame(
        [(i, "g", 100) for i in range(10)], "event_id long, t string, v long"
    )
    out = audit.zscore_outliers(df, "t", F.col("v"), ["event_id"])
    assert out.count() == 0


def test_zscore_boundary_is_integer_exact(spark):
    # group of 9 at 100 plus one at 1000: the outlier decision replays
    # exactly via (n*x - S)^2 > 4 * (n*Q - S^2)
    vals = [100] * 9 + [1000]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)], "event_id long, t string, v long"
    )
    out = audit.zscore_outliers(df, "t", F.col("v"), ["event_id"]).collect()
    n, s, q = 10, sum(vals), sum(v * v for v in vals)
    expect = {
        i for i, v in enumerate(vals) if (n * v - s) ** 2 > 4 * (n * q - s * s)
    }
    assert {r["event_id"] for r in out} == expect and expect == {9}


def test_drift_identical_slices_score_zero(spark):
    # same distribution in both halves -> JS == 0 exactly
    rows = [("g", i % 5, h) for i in range(50) for h in (0, 1)]
    df = spark.createDataFrame(rows, "g string, b long, h int")
    out = audit.distribution_drift_js(
        df, "g", F.col("b"), F.col("h") == 1, n_bins=5
    ).collect()
    assert out[0]["js_nano"] == 0


def test_drift_disjoint_slices_score_ln2(spark):
    # fully disjoint supports -> JS = ln 2 (in nano units, floored)
    rows = [("g", 0, 1)] * 10 + [("g", 1, 0)] * 10
    df = spark.createDataFrame(rows, "g string, b long, h int")
    out = audit.distribution_drift_js(
        df, "g", F.col("b"), F.col("h") == 1, n_bins=2
    ).collect()
    import math

    assert abs(out[0]["js_nano"] / 1e9 - math.log(2)) < 1e-6


def test_inverted_index_cap_and_exact_df(spark):
    from hadoop_0_20_2_ljx_spark.extensions.relevance import inverted_index

    docs = spark.createDataFrame(
        [(i, "common unique%d" % i) for i in range(30)], "doc_id long, text string"
    )
    out = {
        r["term"]: r
        for r in inverted_index(docs, "doc_id", "text", min_df=1, postings_cap=5).collect()
    }
    c = out["common"]
    # df/tf exact over all 30 docs, postings capped at the 5 smallest ids
    assert c["doc_freq"] == 30 and c["total_tf"] == 30
    assert c["postings"] == "0,1,2,3,4"
    assert out["unique7"]["postings"] == "7"


def test_drift_one_sided_group_does_not_crash(spark):
    # a group entirely inside one slice: missing slice = zero
    # distribution, JS degenerates to ln2/2 — must not NaN-crash
    rows = [("g", i % 3, 1) for i in range(12)]
    df = spark.createDataFrame(rows, "g string, b long, h int")
    out = audit.distribution_drift_js(
        df, "g", F.col("b"), F.col("h") == 1, n_bins=3
    ).collect()
    import math

    assert abs(out[0]["js_nano"] / 1e9 - math.log(2) / 2) < 1e-6


def test_zscore_survives_int64_overflow_regime(spark):
    # values whose boundary products overflow int64 but fit DECIMAL(38,0):
    # max_cents = 5e9 ($50M), 100 rows -> n*Q ~ 100^2 * 2.5e19 = 2.5e23
    # >> 2^63 ~ 9.2e18. The old pure-BIGINT arithmetic either nulled (lost
    # outliers) or errored under ANSI; the decimal path must match an
    # exact big-int replay in Python.
    big = 5_000_000_000
    vals = [big] * 99 + [big // 2]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)], "event_id long, t string, v long"
    )
    out = audit.zscore_outliers(df, "t", F.col("v"), ["event_id"]).collect()
    n, s, q = len(vals), sum(vals), sum(v * v for v in vals)
    expect = {
        i for i, v in enumerate(vals) if (n * v - s) ** 2 > 4 * (n * q - s * s)
    }
    assert {r["event_id"] for r in out} == expect and expect == {99}


def test_drift_n_bins_is_enforced(spark):
    # bins beyond n_bins-1 must fold into the last bin (state bound):
    # with n_bins=2, bins {5, 9} both land in bin 1 -> identical slices
    # -> JS == 0; without the clamp the supports are disjoint (JS = ln2).
    rows = [("g", 5, 1)] * 10 + [("g", 9, 0)] * 10
    df = spark.createDataFrame(rows, "g string, b long, h int")
    out = audit.distribution_drift_js(
        df, "g", F.col("b"), F.col("h") == 1, n_bins=2
    ).collect()
    assert out[0]["js_nano"] == 0


def test_zscore_fractional_threshold_exact(spark):
    # z=2.5 -> z^2=6.25 must NOT round to 6 (the pre-r5 integer cast
    # loosened the boundary): replay the decision in exact rationals
    # 10^4*dev^2 > 62500*var_n2 against every row
    # row 8 (130) sits BETWEEN the 6·var and 6.25·var boundaries: outlier
    # under the rounded threshold, inlier under the exact one
    vals = [95, 103, 92, 98, 90, 110, 92, 98, 130]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)], "event_id long, t string, v long"
    )
    out = audit.zscore_outliers(
        df, "t", F.col("v"), ["event_id"], z_threshold=2.5
    ).collect()
    n, s, q = len(vals), sum(vals), sum(v * v for v in vals)
    expect = {
        i
        for i, v in enumerate(vals)
        if 10_000 * (n * v - s) ** 2 > 62_500 * (n * q - s * s)
    }
    got = {r["event_id"] for r in out}
    assert got == expect
    # and the set must differ from what the rounded-to-6 boundary gives,
    # proving the fixture actually exercises the fractional part
    loosened = {
        i for i, v in enumerate(vals) if (n * v - s) ** 2 > 6 * (n * q - s * s)
    }
    assert loosened != expect

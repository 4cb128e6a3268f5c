"""Unit + plan tests for temporal joins (as-of, binned range) and BM25.

The oracle suite (test_oracle_queries) cross-checks the fixture-scale
results against DuckDB's native ASOF/IE joins; these tests pin the exact
edge semantics (inclusivity, null-match, bin boundaries) on hand-built
micro-frames and assert the range join's plan is the bin equi-join, not
a nested-loop cross product.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hadoop_0_20_2_ljx_spark.extensions import relevance, temporal


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [("a", 10, "L1"), ("a", 20, "L2"), ("a", 5, "L0"), ("b", 7, "L3")],
        "k string, t long, tag string",
    )
    right = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 15, 2.0), ("b", 8, 9.0)],
        "k string, t long, v double",
    )
    out = temporal.asof_join(left, right, ["k"], "t", "t", ["v"])
    rows = {r["tag"]: (r["v"], r["_asof_matched_ts"]) for r in out.collect()}
    assert rows["L1"] == (1.0, 10)  # inclusive at equality
    assert rows["L2"] == (2.0, 15)  # latest prior, not first
    assert rows["L0"] == (None, None)  # nothing at or before t=5
    assert rows["L3"] == (None, None)  # right row is strictly later
    assert out.count() == left.count()  # left-join shape


def test_asof_rejects_column_collision(spark):
    df = spark.createDataFrame([("a", 1, 2.0)], "k string, t long, v double")
    try:
        temporal.asof_join(df, df, ["k"], "t", "t", ["v"])
        raise AssertionError("expected ValueError on value_cols collision")
    except ValueError:
        pass


def test_range_join_binned_boundaries(spark):
    points = spark.createDataFrame(
        [(0, 100), (1, 199), (2, 200), (3, 99), (4, 1050)], "pid long, p long"
    )
    intervals = spark.createDataFrame(
        [(10, 100, 200), (11, 950, 1100)], "iid long, s long, e long"
    )
    # bin width 64: interval [100,200) spans bins 1..3, [950,1100) spans 14..17
    out = temporal.range_join_binned(points, intervals, "p", "s", "e", bin_width=64)
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    # start inclusive (100), end exclusive (200), multi-bin intervals exact,
    # and no duplicate (pid, iid) pairs from the bin explode
    assert got == [(0, 10), (1, 10), (4, 11)]


def test_range_join_plan_is_equi_not_nested_loop(spark):
    points = spark.range(1000).select(
        F.col("id").alias("pid"), (F.col("id") * 37 % 5000).alias("p")
    )
    intervals = spark.range(100).select(
        F.col("id").alias("iid"),
        (F.col("id") * 50).alias("s"),
        (F.col("id") * 50 + 40).alias("e"),
    )
    out = temporal.range_join_binned(points, intervals, "p", "s", "e", bin_width=50)
    plan = plan_of(out)
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_asof_single_shuffle(spark):
    left = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 3).alias("t"))
    right = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 7).alias("t"), F.lit(1.0).alias("v"))
    out = temporal.asof_join(left, right, ["k"], "t", "t", ["v"])
    # one Exchange for the window partitioning; the union sides must not
    # each shuffle separately on a different key
    plan = plan_of(out)
    assert plan.count("Exchange hashpartitioning") <= 1


def test_bm25_matches_hand_computation(spark):
    docs = spark.createDataFrame(
        [(1, "x y spark spark"), (2, "spark z"), (3, "y z w q")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_terms"], r["bm25"])
        for r in relevance.bm25_scores(docs, "doc_id", "text", ["spark"]).collect()
    }
    assert set(out) == {1, 2}  # doc 3 has no query term
    n, avgdl = 3, (4 + 2 + 4) / 3
    idf = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))

    def score(tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    assert out[1] == (1, round(score(2, 4), 4))
    assert out[2] == (1, round(score(1, 2), 4))
    # higher tf at same length ranks higher
    assert out[1][1] > out[2][1]


def test_range_join_matches_brute_force(spark):
    import random

    rng = random.Random(11)
    points = [(i, rng.randint(0, 2000)) for i in range(300)]
    intervals = []
    for j in range(60):
        s = rng.randint(0, 2000)
        intervals.append((j, s, s + rng.randint(1, 300)))
    p = spark.createDataFrame(points, "pid long, p long")
    iv = spark.createDataFrame(intervals, "iid long, s long, e long")
    for bw in (64, 256, 1000):
        out = temporal.range_join_binned(p, iv, "p", "s", "e", bin_width=bw)
        got = sorted((r["pid"], r["iid"]) for r in out.collect())
        exp = sorted(
            (pid, iid)
            for pid, pt in points
            for iid, s, e in intervals
            if s <= pt < e
        )
        assert got == exp, f"bin_width={bw}"


def test_range_join_guards_degenerate_intervals(spark):
    import pytest as _pytest

    p = spark.createDataFrame([(0, 5)], "pid long, p long")
    iv = spark.createDataFrame([(1, 0, 10_000_000)], "iid long, s long, e long")
    out = temporal.range_join_binned(
        p, iv, "p", "s", "e", bin_width=10, max_bins_per_interval=100
    )
    with _pytest.raises(Exception, match="binned temporal join"):
        out.collect()


def test_overlap_join_matches_brute_force(spark):
    import random

    rng = random.Random(23)
    lefts = [(i, s := rng.randint(0, 1500), s + rng.randint(1, 200)) for i in range(80)]
    rights = [(j, s := rng.randint(0, 1500), s + rng.randint(1, 200)) for j in range(70)]
    l = spark.createDataFrame(lefts, "lid long, ls long, le long")
    r = spark.createDataFrame(
        [(j, s, e) for j, s, e in rights], "rid long, rs long, re long"
    )
    for bw in (64, 250, 2000):
        out = temporal.overlap_join_binned(l, r, "ls", "le", "rs", "re", bin_width=bw)
        got = sorted((x["lid"], x["rid"]) for x in out.collect())
        exp = sorted(
            (lid, rid)
            for lid, ls, le in lefts
            for rid, rs, re in rights
            if ls < re and rs < le
        )
        assert got == exp, f"bin_width={bw}"


def test_bin_of_exact_beyond_double_range(spark):
    """Bin ids must be exact for epoch-nanos-scale longs (~1.7e18):
    double division mis-rounds above 2^53."""
    from hadoop_0_20_2_ljx_spark.extensions.temporal import _bin_of

    bw = 3_600_000_000_000  # 1h in nanos
    vals = [1_700_000_000_123_456_789, 2**62 - 3, 1_699_999_999_999_999_999]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["v"]: r["b"] for r in df.select("v", _bin_of(F.col("v"), bw).alias("b")).collect()}
    assert got == {v: v // bw for v in vals}


def test_range_join_inverted_and_null_intervals_match_nothing(spark):
    points = spark.createDataFrame([(0, 50)], "pid long, p long")
    intervals = spark.createDataFrame(
        [(1, 100, 40), (2, 60, 60), (3, None, 100), (4, 40, None), (5, 40, 60)],
        "iid long, s long, e long",
    )
    out = temporal.range_join_binned(points, intervals, "p", "s", "e", bin_width=32)
    # inverted (100,40), empty (60,60), and NULL-bound intervals drop
    # silently (SQL-predicate semantics) — only the valid [40,60) matches
    assert [(r["pid"], r["iid"]) for r in out.collect()] == [(0, 5)]


def test_asof_null_value_rows_are_real_matches(spark):
    """A right row whose value is NULL is still the match (DuckDB ASOF /
    pandas merge_asof semantics) — it must not be skipped in favor of a
    stale older row."""
    left = spark.createDataFrame([("a", 10)], "k string, t long")
    right = spark.createDataFrame(
        [("a", 1, 3.0), ("a", 5, None)], "k string, t long, v double"
    )
    row = temporal.asof_join(left, right, ["k"], "t", "t", ["v"]).collect()[0]
    assert row["v"] is None and row["_asof_matched_ts"] == 5


def test_asof_forward_inclusive(spark):
    left = spark.createDataFrame(
        [("a", 10, "L1"), ("a", 20, "L2"), ("a", 30, "L4"), ("b", 9, "L3")],
        "k string, t long, tag string",
    )
    right = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 25, 2.0), ("b", 8, 9.0)],
        "k string, t long, v double",
    )
    out = temporal.asof_join(left, right, ["k"], "t", "t", ["v"], direction="forward")
    rows = {r["tag"]: (r["v"], r["_asof_matched_ts"]) for r in out.collect()}
    assert rows["L1"] == (1.0, 10)  # inclusive at equality
    assert rows["L2"] == (2.0, 25)  # earliest following, not latest
    assert rows["L4"] == (None, None)  # nothing at or after t=30
    assert rows["L3"] == (None, None)  # right row is strictly earlier
    assert out.count() == left.count()


def test_asof_rejects_bad_direction(spark):
    import pytest

    df = spark.createDataFrame([("a", 1, 2.0)], "k string, t long, x double")
    with pytest.raises(ValueError, match="direction"):
        temporal.asof_join(df, df, ["k"], "t", "t", ["x2"], direction="nearest")


def test_merge_intervals_known_spans(spark):
    from hadoop_0_20_2_ljx_spark.extensions.temporal import merge_intervals

    # [0,10] + [5,15] overlap; [15,25] touches (start == prev end) and
    # merges; [40,50] opens a new span; a duplicate (5,15) row must not
    # split anything
    rows = [
        (1, 100, 0, 10),
        (2, 100, 5, 15),
        (3, 100, 5, 15),
        (4, 100, 15, 25),
        (5, 100, 40, 50),
        (6, 200, 0, 1),
    ]
    df = spark.createDataFrame(rows, "id long, k long, s long, e long")
    spans = {
        (r["k"], r["span_start"], r["span_end"]): r["n_intervals"]
        for r in merge_intervals(df, ["k"], "s", "e", "id").collect()
    }
    assert spans == {(100, 0, 25): 4, (100, 40, 50): 1, (200, 0, 1): 1}


def test_merge_intervals_output_schema_is_contract_only(spark):
    from hadoop_0_20_2_ljx_spark.extensions.temporal import merge_intervals

    df = spark.createDataFrame([(1, 9, 0, 5)], "id long, k long, s long, e long")
    out = merge_intervals(df, ["k"], "s", "e", "id")
    assert out.columns == ["k", "span_start", "span_end", "n_intervals"]


def test_merge_intervals_randomized_vs_python_sweep(spark):
    """Random intervals per key with heavy duplicate starts, touching
    edges (start == prev end must MERGE), containment, and zero-length
    intervals — one Spark run compared per key against the classic
    serial sweep. The window form's prefix-max + open-flag segmentation
    must agree with running-state semantics on every span boundary."""
    import random

    from hadoop_0_20_2_ljx_spark.extensions.temporal import merge_intervals

    rng = random.Random(6)
    rows = []
    rid = 0
    for key in ("a", "b", "c"):
        for _ in range(120):
            s = rng.randint(0, 60)
            e = s + rng.randint(0, 12)  # zero-length allowed
            rows.append((key, s, e, rid))
            rid += 1
    df = spark.createDataFrame(rows, "k string, s long, e long, id long")
    got = {
        (r["k"], r["span_start"], r["span_end"]): r["n_intervals"]
        for r in merge_intervals(df, ["k"], "s", "e", "id").collect()
    }

    expect = {}
    per: dict[str, list] = {}
    for k, s, e, _ in rows:
        per.setdefault(k, []).append((s, e))
    for k, iv in per.items():
        iv.sort()
        cur_s, cur_e, n = None, None, 0
        for s, e in iv:
            if cur_s is None or s > cur_e:
                if cur_s is not None:
                    expect[(k, cur_s, cur_e)] = n
                cur_s, cur_e, n = s, e, 1
            else:
                cur_e = max(cur_e, e)
                n += 1
        expect[(k, cur_s, cur_e)] = n
    assert got == expect

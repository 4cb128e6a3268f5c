"""Property tests: the degree-oriented triangle counter and the
integer-exact outlier detector replay exactly against brute-force
reference implementations on seeded random inputs — beyond the fixture
shapes the oracle queries exercise."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from hadoop_0_20_2_ljx_spark.extensions import audit
from hadoop_0_20_2_ljx_spark.extensions.graph import triangle_counts


def _brute_triangles(edges: set[tuple[int, int]]) -> dict[int, int]:
    nodes = sorted({n for e in edges for n in e})
    und = {frozenset(e) for e in edges if e[0] != e[1]}
    out: dict[int, int] = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if (
            frozenset((a, b)) in und
            and frozenset((b, c)) in und
            and frozenset((a, c)) in und
        ):
            for n in (a, b, c):
                out[n] = out.get(n, 0) + 1
    return out


def test_triangles_match_brute_force_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(4):
        n = 12
        edges = {
            (a, b)
            for a in range(n)
            for b in range(n)
            if a != b and rng.random() < 0.35
        }
        df = spark.createDataFrame(sorted(edges), "src long, dst long")
        got = {
            r["node"]: r["triangles"]
            for r in triangle_counts(df, "src", "dst").collect()
        }
        assert got == _brute_triangles(edges), f"trial {trial}"


def test_triangles_degenerate_graphs(spark):
    # self-loops only, and a triangle-free path: both must return empty
    loops = spark.createDataFrame([(1, 1), (2, 2)], "src long, dst long")
    assert triangle_counts(loops).count() == 0
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    assert triangle_counts(path).count() == 0


def test_zscore_outliers_match_brute_force(spark):
    rng = random.Random(11)
    rows = [(i, f"g{i % 3}", rng.randrange(0, 1000)) for i in range(300)]
    # inject extremes so every group has outliers
    rows += [(1000 + g, f"g{g}", 100_000) for g in range(3)]
    df = spark.createDataFrame(rows, "event_id long, t string, v long")
    got = {
        r["event_id"]
        for r in audit.zscore_outliers(df, "t", F.col("v"), ["event_id"]).collect()
    }
    expect = set()
    for g in ("g0", "g1", "g2"):
        vals = [(i, v) for i, t, v in rows if t == g]
        n = len(vals)
        s = sum(v for _, v in vals)
        q = sum(v * v for _, v in vals)
        for i, v in vals:
            if (n * v - s) ** 2 > 4 * (n * q - s * s) > 0:
                expect.add(i)
    assert got == expect and expect

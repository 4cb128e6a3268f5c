"""ExampleDriver roster: every runnable program executes and is sane."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_0_20_2_ljx_spark import jobs
from tests.conftest import SF_SMOKE

RUNNABLE = [
    "wordcount",
    "aggregatewordcount",
    "aggregatewordhist",
    "grep",
    "secondarysort",
    "join",
    "multifilewc",
]


@pytest.mark.parametrize("name", RUNNABLE)
def test_table_programs_run(spark, name):
    fn, _ = jobs.PROGRAMS[name]
    df = fn(spark, SF_SMOKE)
    assert df.count() > 0


def test_generators_deterministic(spark):
    a = jobs.PROGRAMS["randomwriter"][0](spark, "1000").agg(F.sum(F.hash("text"))).collect()
    b = jobs.PROGRAMS["randomwriter"][0](spark, "1000").agg(F.sum(F.hash("text"))).collect()
    assert a == b


def test_teravalidate_confirms_sort(spark):
    res = jobs.teravalidate(spark, "20000").collect()[0]
    assert res["sorted"] is True
    assert res["n_rows"] == 20000


def test_pi_deterministic(spark):
    got = jobs.pi(spark, "10000").collect()[0]["pi_est"]
    from hadoop_0_20_2_ljx_spark.operators.generators import halton_pi_exact

    assert got == round(halton_pi_exact(10000), 9)


def test_sudoku_solves_known_puzzle(spark):
    sols = jobs.sudoku(spark).collect()
    assert len(sols) == 1
    s = sols[0]["solution"]
    assert s.startswith("534678912")
    for r in range(9):
        assert sorted(s[r * 9 : (r + 1) * 9]) == list("123456789")
    for c in range(9):
        assert sorted(s[c::9]) == list("123456789")


def test_sudoku_branch_split_finds_same_solution(spark):
    # blank one more cell of the known solution: the branch fan-out must
    # still converge to exactly the same single solution
    base = jobs.sudoku(spark).collect()[0]["solution"]
    puzzle = "0" + base[1:]
    sols = jobs.sudoku(spark, puzzle).collect()
    assert [r["solution"] for r in sols] == [base]


def test_pentomino_3x20_full_solution_set(spark):
    # 3x20 with the symmetry prune off: the raw solution set is exactly the
    # two published tilings x the 4 board symmetries = 8; every solution
    # must tile all 60 cells with all 12 piece letters.
    from hadoop_0_20_2_ljx_spark.operators.dancing import distributed_pentomino

    sols = [
        r["solution"]
        for r in distributed_pentomino(
            spark, 20, 3, depth=2, restrict_first=False
        ).collect()
    ]
    assert len(sols) == 8 and len(set(sols)) == 8
    for board in sols:
        assert len(board) == 60 and "." not in board
        assert sorted(set(board)) == sorted("filnptuvwxyz")


def test_pentomino_prefix_split_matches_serial(spark):
    # the distributed prefix-split union must equal the undistributed search
    from hadoop_0_20_2_ljx_spark.operators.dancing import (
        ExactCover,
        pentomino_rows,
        solution_board,
    )

    rows = pentomino_rows(20, 3, restrict_first=True)
    serial = {
        solution_board(rows, s, 20, 3) for s in ExactCover(rows, 60).solve()
    }
    dist = {r["solution"] for r in jobs.pentomino(spark, 20, 3, 2).collect()}
    # on a height-3 board the x piece sits on the y-midline, so the prune
    # keeps each tiling plus its vertical flip (reference MID_Y category):
    # 2 distinct classes x 2 = 4
    assert dist == serial and len(serial) == 4


def test_dbcount_runs_and_verifies(spark):
    res = jobs.dbcount(spark, "5000").collect()[0]
    assert res["verified"] is True
    assert res["n_access"] == 5000
    assert res["n_urls"] == 97


def test_gridmix_mix_runs_and_is_deterministic(spark):
    a = sorted(map(tuple, jobs.gridmix(spark, SF_SMOKE).collect()))
    assert [r[0] for r in a] == sorted(
        ["streamSort", "webdataScan", "combiner", "monsterQuery", "webdataSort"]
    )
    by_name = {r[0]: r for r in a}
    # the chained monsterQuery keeps shrinking the data; the scan sample is
    # a strict subset of the corpus; the sort is row-preserving
    n_docs = 500
    assert by_name["streamSort"][1] == n_docs
    assert 0 < by_name["webdataScan"][1] < n_docs
    assert 0 <= by_name["monsterQuery"][1] < by_name["webdataScan"][1] + n_docs // 10
    assert by_name["webdataSort"][1] == by_name["webdataScan"][1]
    b = sorted(map(tuple, jobs.gridmix(spark, SF_SMOKE).collect()))
    assert a == b

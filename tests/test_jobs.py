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


def test_not_implemented_programs(spark):
    with pytest.raises(NotImplementedError):
        jobs.pentomino(spark)


def test_dbcount_runs_and_verifies(spark):
    res = jobs.dbcount(spark, "5000").collect()[0]
    assert res["verified"] is True
    assert res["n_access"] == 5000
    assert res["n_urls"] == 97

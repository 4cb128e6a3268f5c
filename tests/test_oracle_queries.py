"""The main correctness gate: every declared query vs its DuckDB oracle
at sf0.001 (the driver repeats this at sf0.01 — same protocol,
FIXTURES.md 'Oracle protocol')."""

from __future__ import annotations

import pytest

from hadoop_0_20_2_ljx_spark.oracle import run_query
from hadoop_0_20_2_ljx_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, name):
    ok, msg = run_query(name, spark, SF_SMOKE)
    assert ok, f"{name}: {msg}"


def test_registry_covers_survey_sections():
    """SURVEY.md §2 coverage sanity: every operator family has >=1 query."""
    prefixes = {n.split("_")[1] for n in REGISTRY}
    for family in (
        "scan", "gen", "proj", "filter", "sort", "top", "agg", "join", "set",
        "sink", "udf", "num", "fn", "stream", "dedup", "embed", "text", "multimodal",
    ):
        assert family in prefixes, f"no queries for family {family}"


def test_evidence_window_is_exactly_fifty_leading_names():
    """The driver records EXACTLY the first 50 registry rows per round:
    an over-filled window silently drops evidence candidates past the
    cut, an under-filled one wastes recording slots on aged proofs."""
    from hadoop_0_20_2_ljx_spark.queries import _NEEDS_FRESH_EVIDENCE

    assert len(_NEEDS_FRESH_EVIDENCE) == 50
    assert len(set(_NEEDS_FRESH_EVIDENCE)) == 50
    assert list(REGISTRY)[:50] == _NEEDS_FRESH_EVIDENCE


def test_entry_contract(spark):
    """__spark_entry__ contract: entry() returns rows; every queries() key
    with an oracle_sql() entry exists in the registry."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("entrymod", "/root/repo/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    assert m.entry(spark).count() > 0
    qs, osql = m.queries(), m.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) == len(REGISTRY)

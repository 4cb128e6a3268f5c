"""bench.py bookkeeping: the BENCH_LOCAL round-stamp + overwrite guard
(no Spark — pure artifact logic; the r6 driver re-run silently clobbered
the committed local artifact, which this contract forbids)."""

from __future__ import annotations

import json
import os

from bench import dump_local_artifact

FULL = {"metric": "headline_total", "value": 1.0}


def test_inferred_round_is_next_after_newest_driver_artifact(tmp_path):
    (tmp_path / "BENCH_r05.json").write_text("{}")
    (tmp_path / "BENCH_r06.json").write_text("{}")
    out = dump_local_artifact(FULL, str(tmp_path), explicit=None)
    assert out is not None and out.endswith("BENCH_LOCAL_r07.json")
    assert json.load(open(out))["value"] == 1.0


def test_inferred_round_refuses_to_overwrite(tmp_path, capsys):
    (tmp_path / "BENCH_r06.json").write_text("{}")
    committed = tmp_path / "BENCH_LOCAL_r07.json"
    committed.write_text(json.dumps({"value": 99}))
    out = dump_local_artifact(FULL, str(tmp_path), explicit=None)
    assert out is None
    assert json.load(open(committed))["value"] == 99  # untouched
    assert "not explicit" in capsys.readouterr().err


def test_explicit_round_overwrites(tmp_path):
    committed = tmp_path / "BENCH_LOCAL_r07.json"
    committed.write_text(json.dumps({"value": 99}))
    out = dump_local_artifact(FULL, str(tmp_path), explicit="7")
    assert out == str(committed)
    assert json.load(open(out))["value"] == 1.0


def test_no_artifacts_infers_round_one(tmp_path):
    out = dump_local_artifact(FULL, str(tmp_path), explicit=None)
    assert out is not None and out.endswith("BENCH_LOCAL_r01.json")


def test_steal_pct_math():
    # 10 steal ticks over 1000 total ticks elapsed = 1.0%
    from bench import _steal_pct

    assert _steal_pct((100, 1000), (110, 2000)) == 1.0
    # no elapsed ticks (same sample twice) must not divide by zero
    assert _steal_pct((100, 1000), (100, 1000)) == 0.0


def test_steal_ticks_reads_proc_stat():
    # on this Linux host the aggregate cpu line exists: total >= steal >= 0
    from bench import _steal_ticks

    steal, total = _steal_ticks()
    assert 0 <= steal <= total
    assert total > 0

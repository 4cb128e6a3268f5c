"""Registry-wide durable-pin-mode sweep: run EVERY registry query with
``spark.ljx.pin.mode=durable`` (reliable checkpoint — the production
posture for preemptible executors) and compare against the DuckDB oracle,
exactly like tools/driver_sim.py does for the default mode.

Run (from any cwd; ~6 min at sf0.01):

    python tools/durable_sweep.py /root/testdata/sf0.01

Expect a final ``DURABLE MODE: <N> pass, 0 fail of <N>`` line. This sweep
is what caught the r5 kept-lineage bug: k-core references its pinned edge
set twice per peeling round, so the old persist-based durable mode grew
the plan tree 2^rounds and the driver OOMed merely rendering it. Results
under durable mode must be bit-identical to local mode (pinned content is
deterministic); a FAIL here is either a mode-variance bug or a durable-
only crash — both are release blockers for the preemptible posture.

The sweep core (run_sweep) is shared with tools/partition_sweep.py, which
replays the registry under deliberately odd parallelism instead.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


def run_sweep(
    sf_dir: str,
    label: str,
    master: str,
    session_conf: dict[str, str],
    verify=None,
) -> int:
    """Run every registry query under the given session perturbation and
    oracle-compare each result. Returns the number of failures.

    ``verify``, when given, is called with the live SparkSession after
    the replay and may raise (counted as one failure) — used by
    tools/spill_sweep.py to assert the perturbation actually exercised
    the intended path (spill bytes > 0), so the sweep can't pass
    vacuously."""
    from driver_sim import TABLES, fingerprint

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    builder = (
        SparkSession.builder.master(master)
        .appName(f"sweep-{label}")
        .config("spark.driver.memory", "8g")
    )
    for k, v in session_conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # conf may target a live session (getOrCreate reuse): set runtime
    # confs again so the sweep holds even then
    for k, v in session_conf.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static confs (e.g. default.parallelism) can't re-set

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    n_pass = n_fail = 0
    t0 = time.time()
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            rows = [tuple(r) for r in df.collect()]
            if name not in oracles:
                n_pass += 1
                continue
            s_cnt, s_cols, s_hash = fingerprint(df.columns, rows)
            cur = con.execute(oracles[name])
            o_cnt, o_cols, o_hash = fingerprint(
                [d[0] for d in cur.description], cur.fetchall()
            )
            if (s_cnt, s_cols, s_hash) == (o_cnt, o_cols, o_hash):
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL {name}: rows {s_cnt}/{o_cnt} hash {s_hash}/{o_hash}")
        except Exception as ex:  # noqa: BLE001 — report and keep sweeping
            n_fail += 1
            print(f"FAIL {name}: {ex!r}"[:300])
        sys.stdout.flush()
    if verify is not None:
        try:
            verify(spark)
        except Exception as ex:  # noqa: BLE001 — a failed check fails the sweep
            n_fail += 1
            print(f"FAIL <verify>: {ex!r}"[:300])
    print(f"wall {time.time() - t0:.0f}s")
    print(f"{label}: {n_pass} pass, {n_fail} fail of {n_pass + n_fail}")
    return n_fail


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    return (
        0
        if run_sweep(
            sf_dir,
            "DURABLE MODE",
            "local[32]",
            {
                "spark.sql.shuffle.partitions": "32",
                "spark.ljx.pin.mode": "durable",
            },
        )
        == 0
        else 1
    )


if __name__ == "__main__":
    sys.exit(main())

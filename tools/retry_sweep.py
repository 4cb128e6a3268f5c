"""Registry-wide task-RETRY determinism sweep: replay EVERY registry
query with task re-execution actually forced, and require the results to
be bit-identical to an injection-free replay of the same plans.

Run (from any cwd; two full registry passes, ~15 min at sf0.01):

    python tools/retry_sweep.py /root/testdata/sf0.01

Expect a final ``RETRY: <N> pass, 0 fail of <N> (retried_tasks=M)`` line.

Why this gate exists: the reference's core fault model is task
re-execution — speculative second attempts (mapred/TaskInProgress.java:
866-874) and map-output loss refetch/recompute (mapred/TaskTracker.java:
2419) — and session.py auto-enables speculation off-local on the claim
that every operator emits identical partition bytes under re-execution.
Until this sweep, that claim was argued (no rand(), content-hash salts,
tie-broken windows) but never measured. This makes it mechanical.

Mechanism:

  - The session master is ``local[32, 4]`` — local mode's second arg is
    spark.task.maxFailures, so the scheduler actually RETRIES failed
    tasks instead of aborting the stage (plain ``local[N]`` runs with
    maxFailures=1 and can never exercise a retry).
  - ``catalog.load`` is monkeypatched to append an identity
    ``mapInPandas`` whose function raises on
    ``TaskContext.attemptNumber() == 0`` — every task of every stage
    containing a table scan fails its first attempt and is re-executed.
  - Result collection goes through ``df.rdd.mapPartitions`` with the
    same injector, so every job's RESULT stage is also re-executed.
  - A vacuity guard: an accumulator counts successful attempt>0 task
    executions; every query must record at least one retried task, and
    the sweep total is printed (a sweep that retried nothing FAILS).

Both passes run the SAME wrapped plans (pass A's injector passes rows
through untouched; pass B's fails first attempts), so the strict
fingerprint diff isolates exactly one variable: task re-execution.
Strict means bit-level — floats are rendered via ``float.hex()``, no
rounding, no numeric normalization — unlike the oracle comparison,
which canonicalizes. Pass B is ALSO oracle-compared (driver_sim
fingerprint) so a wrapper bug that broke both passes identically would
still surface.

Coverage note (honest): the attempt-0 injector re-executes every stage
that contains a table scan or the result collection — for the dominant
single-shuffle registry shapes that is every stage of the job.
Interior shuffle-map stages of deeper chains execute once per pass; the
A-vs-B comparison still re-executes them in a fresh process state
(whole-plan rerun determinism), but no partial task-level retry is
forced inside them. The FetchFailed partial-recompute hazard (one
consumer saw the old attempt's output, another the new) is defended at
the operator level — content-hash salts, not rand() (operators/
skew.py:_row_salt) — and those building blocks are unit-pinned.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


def _strict_render(v) -> str:
    """Bit-level rendering: float.hex (no rounding), bytes hex, recursive
    containers; everything else repr."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        return v.hex()  # handles nan/inf; bit-exact for finite values
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):  # Row is a tuple subclass
        return "[" + ",".join(_strict_render(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted((_strict_render(k), _strict_render(x)) for k, x in v.items())
        return "{" + ",".join(f"{k}:{x}" for k, x in items) + "}"
    return repr(v)


def strict_fingerprint(cols: list[str], rows: list) -> str:
    """Order-insensitive (multiset) bit-level fingerprint."""
    import hashlib

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rendered = sorted("|".join(_strict_render(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(rendered).encode()).hexdigest()


def _make_injector(acc, fail: bool):
    """A per-partition wrapper: fail the task's FIRST attempt (pass B),
    count successful attempt>0 executions (the vacuity signal). Works as
    both a mapInPandas function (iterator of pandas frames) and an RDD
    mapPartitions function (iterator of Rows) — it only touches the
    iterator identity-wise."""

    def gen(it):
        from pyspark import TaskContext

        tc = TaskContext.get()
        if tc is not None:
            if fail and tc.attemptNumber() == 0:
                raise RuntimeError("retry_sweep: injected first-attempt failure")
            if tc.attemptNumber() > 0:
                acc.add(1)
        yield from it

    return gen


def _run_pass(spark, con, qs, oracles, sf_dir, acc, fail: bool, only=None):
    """One registry replay with wrapped sources + wrapped collection.
    Returns (results dict name -> strict_fp | None on error,
             per-query retried counts, failures list)."""
    from driver_sim import fingerprint

    from hadoop_0_20_2_ljx_spark import catalog

    orig_load = catalog.load
    injector = _make_injector(acc, fail)

    def wrapped_load(spark_, sf_dir_, name_):
        df = orig_load(spark_, sf_dir_, name_)
        return df.mapInPandas(injector, schema=df.schema)

    results: dict[str, str | None] = {}
    retried: dict[str, int] = {}
    failures: list[str] = []
    catalog.load = wrapped_load
    try:
        for name, fn in qs.items():
            if only is not None and name not in only:
                continue
            before = acc.value
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
                cols = df.columns
                rows = df.rdd.mapPartitions(injector).collect()
                results[name] = strict_fingerprint(cols, rows)
                retried[name] = acc.value - before
                if fail and name in oracles:
                    s = fingerprint(cols, [tuple(r) for r in rows])
                    cur = con.execute(oracles[name])
                    o = fingerprint([d[0] for d in cur.description], cur.fetchall())
                    if s != o:
                        failures.append(f"{name}: retried result diverges from oracle")
                tag = "RETRY" if fail else "BASE"
                print(
                    f"{tag} {name} ({len(rows)} rows, "
                    f"{retried[name]} retried tasks, {time.time() - t0:.1f}s)"
                )
            except Exception as ex:  # noqa: BLE001 — report and keep sweeping
                results[name] = None
                failures.append(f"{name}: EXCEPTION {ex!r}"[:300])
                print(f"FAIL {name}: {ex!r}"[:300])
            sys.stdout.flush()
    finally:
        catalog.load = orig_load
    return results, retried, failures


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # optional argv[2]: comma-separated query names for fast iteration.
    # The GATE is the full run (no second arg).
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from driver_sim import TABLES

    spark = (
        SparkSession.builder.master("local[32, 4]")  # maxFailures=4: retries ON
        .appName("retry-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    # every injected first-attempt failure logs a WARN traceback from the
    # TaskSetManager plus an ERROR one from the Executor; at ~1 per task
    # x 186 queries that output would swamp the report. Real query
    # failures still surface via the Python exception path below.
    spark.sparkContext.setLogLevel("FATAL")
    acc = spark.sparkContext.accumulator(0)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    if only is not None:
        unknown = sorted(only - qs.keys())
        if unknown:
            print(f"FAIL unknown query name(s): {', '.join(unknown)}")
            return 1

    t_all = time.time()
    base, _, fail_a = _run_pass(spark, con, qs, oracles, sf_dir, acc, False, only)
    retry, retried, fail_b = _run_pass(spark, con, qs, oracles, sf_dir, acc, True, only)

    failures = fail_a + fail_b
    for name in base:
        if base[name] is None or retry.get(name) is None:
            continue  # already recorded as an exception failure
        if base[name] != retry[name]:
            failures.append(f"{name}: retried fingerprint != baseline (bit diff)")
        if retried.get(name, 0) == 0:
            failures.append(f"{name}: VACUOUS — no task was actually retried")

    total_retried = sum(retried.values())
    n = len(retry)
    print(f"total wall: {time.time() - t_all:.0f}s")
    if total_retried == 0:
        failures.append("<sweep>: VACUOUS — zero retried tasks overall")
    if not failures:
        print(f"RETRY: {n} pass, 0 fail of {n} (retried_tasks={total_retried})")
        return 0
    for f in failures:
        print(f"FAIL {f}")
    print(f"RETRY: {n - len(failures)} pass, {len(failures)} fail of {n}")
    return 1


if __name__ == "__main__":
    sys.exit(main())

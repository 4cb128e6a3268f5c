"""Decade-ladder scale probe: run headline generated-data workloads one
decade PAST their per-round bench sizes and print the wall/shuffle
ladder as one JSON line. One-off evidence (too slow for the per-round
bench); results are recorded in SCALE.md with this command:

    python tools/scale_probe.py                  # all ladders, ~15 min
    python tools/scale_probe.py asof triangles   # just the named ones

Ladders:
  - terasort 1M -> 10M -> 100M 100-byte rows (10 MB -> 1 GB -> 10 GB
    through TeraGen -> total-order sort -> TeraValidate) — the
    range-partition + spill path.
  - minhash LSH dedup 5k -> 50k -> 500k generated docs (20% planted
    exact-duplicate rate, the bench_minhash_10x generator) — signature
    build linear in corpus tokens, pair stage bounded by bucket
    collisions; the planted-pair recall assert runs at every rung.
  - triangles 100k -> 1M -> 10M edges (r10, the r9 verdict's task 6:
    the graph family had only a 1x/10x pair and the highest remaining
    superlinear risk — hub wedges). Hub-heavy mix exactly as
    bench_graph_10x (1/16 of endpoint draws on 10 hubs, the case
    degree orientation exists for), auto-broadcast disabled so the
    shuffle-join regime's curve is the one that extrapolates, the
    triangle-node assert at every rung.
  - as-of join 100k -> 1M -> 10M fixed-density event rows (r10, the
    task-6 alternative, added after triangles): bench_temporal_10x's
    generator one decade further — the one-union-exchange claim at 5M
    output rows, with the every-click-kept and matched-fraction
    asserts at every rung.
  - k-core 100k -> 1M -> 10M edges (r10, completing the graph family:
    the iterative peel is the one remaining superlinear risk — a
    cascade that deepens with graph size would multiply per-round
    alive-join shuffle). Same hub-heavy generator and k=12/6-round
    peel as bench_graph_10x, shuffle-join regime forced, the
    surviving-core assert at every rung.
  - minhash_xl: a FOURTH minhash rung at 5M docs (r11, opt-in by name —
    not in the default set so the default probe stays ~15 min), same
    generator and planted-pair recall assert as the 5k/50k/500k ladder.
    The dedup candidate path is the flagship training-pipeline op; this
    extends its no-knee evidence one more decade (~1.5 GB of raw text
    through signature build + LSH banding).
  - asof_xl / triangles_xl / kcore_xl / pagerank_xl: the same opt-in
    fourth-rung pattern for the as-of join (100M fixed-density event
    rows — 50M output matches), the triangle count (100M hub-heavy
    edges), the k-core peel (100M edges, k=12 x 6 rounds), and pagerank
    (150M edges, 3 rounds with the phase breakdown), r11. Same
    generators and asserts as their three-rung ladders.
  - terasort_xl: 10^9 generated 100-byte rows (~100 GB of records —
    the reference's record run at 1/10 scale on one node) through
    TeraGen -> total-order sort -> TeraValidate, r11. The records
    exceed execution memory ~3:1, so this rung is also a natural-spill
    stress (the pressure_probe regime at ladder scale).
  - pagerank 150k -> 1.5M -> 15M edges (r11, the r10 verdict's task 4:
    the last expensive family without three-rung evidence — the
    iterative-join + per-round pin interaction). bench_pagerank_10x's
    generator (pagerank_edge_stream, avg out-degree ~10) one decade
    further, 3 rounds, shuffle-join regime forced, with the per-phase
    wall breakdown (setup / each round / drain) recorded at every rung
    so a superlinear per-round checkpoint cost would be visible
    directly; the all-nodes-present assert at every rung.
  - clusters 100k -> 1M -> 10M edges (r12, the r11 verdict's task 4:
    connected components is the one iterative family whose ROUND COUNT
    grows with input — component diameter — unlike pagerank's fixed 3
    or kcore's bounded peel, so the rounds x per-round-pin interaction
    is the risk the ladder exists to test). Graph = half long chains
    (10 chains whose length grows 10x per rung, so diameter grows a
    decade per decade and rounds must grow ~log) + half hub-heavy
    random edges (the minhash candidate-graph shape), node id spaces
    disjoint. Per rung: exact chain membership asserted row-by-row
    (every chain node's component must equal its chain minimum),
    hub giant-component coverage >= 95%, full node coverage, the
    convergence round count recorded and asserted under the cap, and
    an order-independent membership checksum recorded.
  - skew 100k -> 1M -> 10M fact rows (r12, the r11 verdict's task 6:
    the salted-join stress pair is single-scale). Fixed 70% hot-key
    share, dim fixed at 1001 keys; per rung BOTH plans run with
    broadcast AND AQE off (AQE skew-split is the first defense in
    production — session.py enables it — but it would split the plain
    hot partition here and mask exactly the curve this ladder
    measures) and shuffle partitions scaled ~rows/31k, the way a real
    cluster sizes reducers. Salt buckets scale ~8x partitions so the
    hot key can occupy every reducer. Metric: MAX-TASK shuffle-read
    bytes (UI REST taskSummary at quantile 1.0) — the straggler that
    decides wall-clock at 100 TB. Claim: the plain join's hot task
    grows ~10x/decade no matter how many reducers exist (the hot key
    is ONE shuffle partition), while the salted plan's max task stays
    ~flat because salting lets per-task work track rows/partitions.
    Row-count equality plain==salted asserted at every rung (value
    parity is the externally-proven q_join_salted oracle).
  - clusters_xl / skew_xl: the opt-in fourth-rung pattern for both new
    ladders (100M edges / 100M fact rows; pass together with the base
    name, e.g. `scale_probe skew skew_xl`, so the growth/flatness
    asserts span all four rungs).
  - skew_aqe (opt-in modifier for skew/skew_xl): runs the SAME plain
    join a third time per rung with AQE skew-split active (runtime
    broadcast still off). This measures the production first-defense
    path AND pins the r12 finding — AQE's skew detection reads map
    output statistics, and past 2000 reduce partitions
    (spark.shuffle.minNumPartitionsToHighlyCompress) those are
    HighlyCompressed: per-block sizes under accurateBlockThreshold
    (100 MB) are AVERAGED, so when each map contributes ~hot/maps MB
    (the normal cluster shape: blocks shrink as maps x reducers grow),
    a multi-GB hot partition is INVISIBLE to AQE and stays unsplit.
    Below 2000 reducers the sizes are exact and AQE splits once the
    hot partition passes its 256 MB threshold. Both regimes are
    asserted; the mitigations (accurateBlockSkewedFactor=5.0 or a
    lower accurateBlockThreshold — static confs, measured in separate
    sessions: 722.5 -> 44.6 MB max task at 30M rows x 3200 reducers)
    are recorded in SCALE.md. Salting is immune — it rewrites the key
    space BEFORE the shuffle, needing no size statistics at all.
  - winsum / winsum_xl (opt-in; r13): the WINDOW analog of the skew
    ladder — 70%-hot-key running sum, direct keyed window vs the
    decomposed skew.chunked_running_sum, same per-MAX-TASK shuffle-read
    metric. Direct's hot key is ONE window partition (grows
    10x/decade; AQE skew split is join-only and cannot reach it);
    chunked's max task tracks rows/partitions (~flat). AQE off for the
    ladder (its coalescing packs the chunked plan's small partitions
    toward the 64 MB advisory target, masking the layout curve — same
    rationale as the skew ladder). Value parity per rung. winsum_xl
    adds the 100M rung (direct = a 70M-row one-task window sort —
    minutes + natural spill).
  - skew_aqe_engine (standalone; run it ALONE — it builds the ENGINE
    session via hadoop_0_20_2_ljx_spark.session.get_spark instead of
    this probe's bare builder, and accurateBlockSkewedFactor is a
    static core conf that must land at context creation):
    re-runs the r12 blindness scenario (30M rows, 3200 reducers —
    HighlyCompressed map statuses) and asserts the engine session's
    accurateBlockSkewedFactor=5.0 default actually restores the AQE
    skew split. This closes the conf-boundary loop: a future
    session.py refactor that drops the mitigation fails THIS assert,
    not just a grep. `python tools/scale_probe.py skew_aqe_engine`

The claim under test: one decade of growth costs ~one decade of wall
and ~one decade of shuffle (no superlinear knee hiding just past the
bench sizes).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import bench
    from hadoop_0_20_2_ljx_spark.extensions import dedup

    if "skew_aqe_engine" in sys.argv[1:]:
        # the conf-boundary variant runs in the ENGINE session — the whole
        # point is asserting get_spark's own static-conf defaults
        # (accurateBlockSkewedFactor lands at context creation, so this
        # must be the process's first/only session)
        from hadoop_0_20_2_ljx_spark.session import get_spark

        spark = get_spark(
            "scale-probe-engine",
            extra_conf={
                "spark.ui.enabled": "true",  # the probe reads REST metrics
                "spark.ui.retainedStages": "100000",
                "spark.driver.memory": "48g",
            },
        )
    else:
        spark = (
            SparkSession.builder.master("local[32]")
            .appName("scale-probe")
            .config("spark.sql.shuffle.partitions", "64")
            .config("spark.driver.memory", "48g")
            .config("spark.ui.retainedStages", "100000")
            .getOrCreate()
        )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, float]] = {}
    # optional argv selector: name the ladders to run (default: all six;
    # minhash_xl is opt-in only — a single ~10-min rung)
    ladders = {
        "terasort", "minhash", "triangles", "asof", "kcore", "pagerank",
        "clusters", "skew",
    }
    pick = set(sys.argv[1:]) or ladders
    unknown = pick - ladders - {
        "minhash_xl", "asof_xl", "triangles_xl", "kcore_xl", "pagerank_xl",
        "terasort_xl", "clusters_xl", "skew_xl", "skew_aqe", "skew_aqe_engine",
        "winsum", "winsum_xl", "winsum_width",
    }
    if unknown:
        print(f"unknown ladder(s): {sorted(unknown)}", file=sys.stderr)
        return 2

    if pick & {"terasort", "terasort_xl"}:
        bench.bench_terasort(spark, n=100_000)  # warm codegen off the ladder
    tera_rungs = (1_000_000, 10_000_000, 100_000_000) if "terasort" in pick else ()
    if "terasort_xl" in pick:
        tera_rungs = tera_rungs + (1_000_000_000,)
    for n in tera_rungs:
        sw0, ib0 = bench._stage_bytes(spark)
        t = time.time()
        bench.bench_terasort(spark, n=n)
        wall = time.time() - t
        sw1, _ = bench._stage_bytes(spark)
        out[f"terasort_{n//1_000_000}m"] = {
            "wall_s": round(wall, 2),
            "shuffle_mb": round((sw1 - sw0) / 1e6, 1),
        }

    def docs(n_docs: int):
        words = F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(32)),
                lambda i: F.substring(
                    F.md5(
                        F.concat_ws(
                            "-",
                            F.pmod(F.col("id"), F.lit(n_docs * 4 // 5)).cast("string"),
                            i.cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
            ),
            " ",
        )
        return spark.range(n_docs).select(
            F.col("id").alias("doc_id"), words.alias("text")
        )

    # warm the dedup codepath off the ladder (the r9 run's 5k wall
    # carried first-compile cost; bytes were unaffected)
    if pick & {"minhash", "minhash_xl"}:
        dedup.minhash_lsh_candidates(
            docs(1_000).localCheckpoint(), "doc_id", "text"
        ).count()
    rungs = (5_000, 50_000, 500_000) if "minhash" in pick else ()
    if "minhash_xl" in pick:
        rungs = rungs + (5_000_000,)
    for n in rungs:
        d = docs(n).localCheckpoint()
        sw0, _ = bench._stage_bytes(spark)
        t = time.time()
        n_pairs = dedup.minhash_lsh_candidates(d, "doc_id", "text").count()
        wall = time.time() - t
        sw1, _ = bench._stage_bytes(spark)
        assert n_pairs >= n // 5, f"minhash_{n}: planted pairs missed ({n_pairs})"
        out[f"minhash_{n // 1000}k"] = {
            "wall_s": round(wall, 2),
            "shuffle_mb": round((sw1 - sw0) / 1e6, 1),
        }

    from hadoop_0_20_2_ljx_spark.extensions.graph import triangle_counts

    def edges(n_edges: int):
        nodes = n_edges // 10

        def node(salt: str):
            h = F.conv(
                F.substring(
                    F.md5(F.concat_ws("-", F.lit(salt), F.col("id").cast("string"))),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            return F.when(h % 16 == 0, F.shiftright(h, 4) % 10).otherwise(
                F.shiftright(h, 4) % F.lit(nodes)
            )

        return spark.range(n_edges).select(node("s").alias("src"), node("d").alias("dst"))

    # shuffle-join regime, as in bench_graph_10x: node-sized tables
    # broadcast locally but are corpus-sized at 100 TB — the shuffle
    # curve is the one that extrapolates
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    if pick & {"triangles", "triangles_xl"}:
        triangle_counts(edges(10_000).localCheckpoint()).count()  # warm off-ladder
    tri_rungs = (100_000, 1_000_000, 10_000_000) if "triangles" in pick else ()
    if "triangles_xl" in pick:
        tri_rungs = tri_rungs + (100_000_000,)
    for n in tri_rungs:
        e = edges(n).localCheckpoint()
        sw0, _ = bench._stage_bytes(spark)
        t = time.time()
        n_tri_nodes = triangle_counts(e).count()
        wall = time.time() - t
        sw1, _ = bench._stage_bytes(spark)
        assert n_tri_nodes > 100, f"triangles_{n}: {n_tri_nodes} triangle nodes"
        out[f"triangles_{n // 1000}k"] = {
            "wall_s": round(wall, 2),
            "shuffle_mb": round((sw1 - sw0) / 1e6, 1),
        }

    from hadoop_0_20_2_ljx_spark.extensions.graph import kcore_peel

    # same shuffle-join regime as triangles (the broadcast-off conf set
    # above is still active here): alive/degree tables are node-sized
    # locally but corpus-sized at 100 TB
    if pick & {"kcore", "kcore_xl"}:
        kcore_peel(edges(10_000).localCheckpoint(), k=12, rounds=6).count()
    kcore_rungs = (100_000, 1_000_000, 10_000_000) if "kcore" in pick else ()
    if "kcore_xl" in pick:
        kcore_rungs = kcore_rungs + (100_000_000,)
    for n in kcore_rungs:
        e = edges(n).localCheckpoint()
        sw0, _ = bench._stage_bytes(spark)
        t = time.time()
        n_core = kcore_peel(e, k=12, rounds=6).count()
        wall = time.time() - t
        sw1, _ = bench._stage_bytes(spark)
        # k=12 sits ~2 sigma under the ~19-mean degree: a core survives
        assert n_core > 100, f"kcore_{n}: {n_core} core nodes"
        out[f"kcore_{n // 1000}k"] = {
            "wall_s": round(wall, 2),
            "shuffle_mb": round((sw1 - sw0) / 1e6, 1),
        }
    from hadoop_0_20_2_ljx_spark.extensions.graph import pagerank_int

    # same forced shuffle-join regime (broadcast-off conf still active):
    # the rank table broadcasts at ladder sizes but is corpus-sized at
    # 100 TB — bench_pagerank_10x measured the 96x round-byte regime
    # change across that boundary, so only the shuffle curve extrapolates
    if pick & {"pagerank", "pagerank_xl"}:
        pagerank_int(
            bench.pagerank_edge_stream(spark, 10_000).localCheckpoint(), iterations=3
        ).count()  # warm off-ladder
    pr_rungs = (150_000, 1_500_000, 15_000_000) if "pagerank" in pick else ()
    if "pagerank_xl" in pick:
        pr_rungs = pr_rungs + (150_000_000,)
    for n in pr_rungs:
        e = bench.pagerank_edge_stream(spark, n).localCheckpoint()
        phases: dict[str, float] = {}
        sw0, _ = bench._stage_bytes(spark)
        t = time.time()
        n_nodes = pagerank_int(e, iterations=3, phase_seconds=phases).count()
        wall = time.time() - t
        sw1, _ = bench._stage_bytes(spark)
        # every node id in [0, n/10) appears w.h.p. at ~20 draws per id
        # (n edges x 2 endpoints over n/10 ids; r11 ADVICE)
        assert n_nodes >= (n // 10) * 99 // 100, f"pagerank_{n}: {n_nodes} nodes"
        out[f"pagerank_{n // 1000}k"] = {
            "wall_s": round(wall, 2),
            "shuffle_mb": round((sw1 - sw0) / 1e6, 1),
            **{f"phase_{k}_s": round(v, 2) for k, v in phases.items()},
        }

    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", "10485760"
    )  # back to default for the asof ladder (bench's asof regime)

    from hadoop_0_20_2_ljx_spark.extensions import temporal

    if pick & {"asof", "asof_xl"}:
        warm = bench.temporal_event_stream(spark, 2_000).localCheckpoint()
        temporal.asof_join(
            warm.where("is_click").select("event_id", "user_id", "t_us"),
            warm.where(~F.col("is_click"))
            .groupBy("user_id", "t_us")
            .agg(F.count(F.lit(1)).cast("double").alias("pval")),
            on=["user_id"], left_ts="t_us", right_ts="t_us", value_cols=["pval"],
        ).agg(F.count("pval")).first()
    asof_rungs = (100_000, 1_000_000, 10_000_000) if "asof" in pick else ()
    if "asof_xl" in pick:
        asof_rungs = asof_rungs + (100_000_000,)
    for n in asof_rungs:
        ev = bench.temporal_event_stream(spark, n).localCheckpoint()
        clicks = ev.where("is_click").select("event_id", "user_id", "t_us")
        purchases = (
            ev.where(~F.col("is_click"))
            .groupBy("user_id", "t_us")
            .agg(F.count(F.lit(1)).cast("double").alias("pval"))
        )
        sw0, _ = bench._stage_bytes(spark)
        t = time.time()
        row = (
            temporal.asof_join(
                clicks, purchases, on=["user_id"], left_ts="t_us",
                right_ts="t_us", value_cols=["pval"],
            )
            .agg(
                F.count(F.lit(1)).alias("n_out"),
                F.count("pval").alias("n_matched"),
            )
            .first()
        )
        wall = time.time() - t
        sw1, _ = bench._stage_bytes(spark)
        assert row["n_out"] == n // 2, f"asof_{n}: every click must be kept"
        assert row["n_matched"] > n // 4, f"asof_{n}: {row['n_matched']} matched"
        out[f"asof_{n // 1000}k"] = {
            "wall_s": round(wall, 2),
            "shuffle_mb": round((sw1 - sw0) / 1e6, 1),
        }

    from hadoop_0_20_2_ljx_spark.extensions.dedup import connected_components

    def cc_edges(n_edges: int):
        """Half long chains + half hub-heavy random edges, disjoint id
        spaces. Chains: 10 of them, length n/20 edges each — component
        DIAMETER grows a full decade per rung, so the star rounds must
        grow ~log (the property pagerank's fixed 3 rounds and kcore's
        bounded peel never exercise). Hubs: the triangles/kcore
        generator shape offset past the chain ids — a realistic
        near-dup candidate graph with a giant component.
        Returns (edges, chain_len_edges, chain_id_span)."""
        n_chain = n_edges // 2
        ch_len = n_chain // 10  # edges per chain; nodes per chain = ch_len+1
        ch_nodes = ch_len + 1
        u = (F.col("id") / ch_len).cast("long") * ch_nodes + F.pmod(
            F.col("id"), F.lit(ch_len)
        )
        chains = spark.range(n_chain).select(
            u.alias("u"), (u + 1).alias("v")
        )
        ch_span = 10 * ch_nodes
        n_hub = n_edges - n_chain
        hub_nodes = n_hub // 10

        def hub_node(salt: str):
            h = F.conv(
                F.substring(
                    F.md5(F.concat_ws("-", F.lit(salt), F.col("id").cast("string"))),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            picked = F.when(h % 16 == 0, F.shiftright(h, 4) % 10).otherwise(
                F.shiftright(h, 4) % F.lit(hub_nodes)
            )
            return picked + F.lit(ch_span)

        hubs = spark.range(n_hub).select(
            hub_node("s").alias("u"), hub_node("d").alias("v")
        )
        return chains.union(hubs), ch_len, ch_span

    if pick & {"clusters", "clusters_xl"}:
        # warm the CC codepath off the ladder
        we, _, _ = cc_edges(10_000)
        connected_components(we.localCheckpoint(), "u", "v").count()
    cl_rungs = (100_000, 1_000_000, 10_000_000) if "clusters" in pick else ()
    if "clusters_xl" in pick:
        cl_rungs = cl_rungs + (100_000_000,)
    for n in cl_rungs:
        e, ch_len, ch_span = cc_edges(n)
        e = e.localCheckpoint()
        # ground truth computable from the edge set: CC must cover
        # exactly the distinct non-self-loop endpoints (self-loops are
        # filtered by the operator's contract; O(1) rows to the driver)
        real = e.filter(F.col("u") != F.col("v"))
        n_nodes = (
            real.select(F.col("u").alias("n"))
            .union(real.select(F.col("v").alias("n")))
            .distinct()
            .count()
        )
        st: dict[str, int] = {}
        sw0, _ = bench._stage_bytes(spark)
        t = time.time()
        cc = connected_components(e, "u", "v", max_iter=40, stats=st)
        cc = cc.localCheckpoint()
        n_assigned = cc.count()
        wall = time.time() - t
        sw1, _ = bench._stage_bytes(spark)
        rounds = st["rounds"]
        assert rounds < 40, f"clusters_{n}: hit the round cap ({rounds})"
        assert n_assigned == n_nodes, f"clusters_{n}: {n_assigned} != {n_nodes} nodes"
        # exact chain membership, row-by-row: chain node x (ids below
        # ch_span) belongs to component min(chain) = x - x mod ch_nodes
        ch_nodes = ch_len + 1
        chain = cc.filter(F.col("node") < ch_span)
        bad = chain.filter(
            F.col("comp") != F.col("node") - F.pmod(F.col("node"), F.lit(ch_nodes))
        ).count()
        assert bad == 0, f"clusters_{n}: {bad} chain nodes mis-clustered"
        assert chain.count() == 10 * ch_nodes, f"clusters_{n}: chain node count"
        # hub half: one giant component w.h.p. (avg degree ~20)
        hub_row = (
            cc.filter(F.col("node") >= ch_span)
            .groupBy("comp")
            .count()
            .agg(
                F.count(F.lit(1)).alias("n_comp"),
                F.max("count").alias("giant"),
                F.sum("count").alias("total"),
            )
            .first()
        )
        assert hub_row["giant"] * 100 >= hub_row["total"] * 95, (
            f"clusters_{n}: giant component {hub_row['giant']}/{hub_row['total']}"
        )
        # order-independent membership checksum (decimal — BIGINT sum of
        # 64-bit hashes overflows under ANSI), recorded for rerun compare
        chk = cc.agg(
            F.sum(F.xxhash64("node", "comp").cast("decimal(38,0)")).alias("c")
        ).first()["c"]
        out[f"clusters_{n // 1000}k"] = {
            "wall_s": round(wall, 2),
            "shuffle_mb": round((sw1 - sw0) / 1e6, 1),
            "rounds": rounds,
            "n_components": int(hub_row["n_comp"]) + 10,
            "membership_checksum": str(chk),
        }

    from hadoop_0_20_2_ljx_spark.operators import skew

    def _max_task_shuffle_read_mb(prev_stage_ids: set[int]) -> float:
        """Max per-task shuffle-read bytes over stages completed since
        prev_stage_ids — UI REST taskSummary at quantile 1.0. The
        straggler task is the number that decides wall-clock at 100 TB;
        stage totals can look identical while one task carries 70%."""
        import urllib.request

        sc = spark.sparkContext
        base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
        with urllib.request.urlopen(f"{base}/stages?status=complete", timeout=10) as r:
            stages = json.load(r)
        mx = 0.0
        skipped: list[int] = []
        for s in stages:
            sid = s["stageId"]
            if sid in prev_stage_ids or s.get("shuffleReadBytes", 0) == 0:
                continue
            url = f"{base}/stages/{sid}/0/taskSummary?quantiles=1.0"
            try:
                with urllib.request.urlopen(url, timeout=10) as r:
                    summ = json.load(r)
            except Exception:
                # stage evicted from the UI store between calls — if the
                # HOT stage is the one skipped, the returned max silently
                # reads low and the downstream growth/AQE asserts fire
                # with misleading messages; refuse to measure instead
                skipped.append(sid)
                continue
            mx = max(mx, summ["shuffleReadMetrics"]["readBytes"][0])
        if skipped:
            raise RuntimeError(
                f"max-task measurement gap: {len(skipped)} shuffle-read "
                f"stage(s) {skipped} could not be summarized (evicted from "
                f"the UI store) — raise spark.ui.retainedStages"
            )
        return round(mx / 1e6, 2)

    def _completed_stage_ids() -> set[int]:
        import urllib.request

        sc = spark.sparkContext
        url = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/stages?status=complete"
        with urllib.request.urlopen(url, timeout=10) as r:
            return {s["stageId"] for s in json.load(r)}

    if pick & {"skew", "skew_xl"}:
        # Fixed regime for the whole ladder: no broadcast (the dim is
        # broadcast-ineligible in the 100 TB scenario this models) and no
        # AQE (its skew-split would break the plain hot partition apart
        # at the top rung and its coalescing would merge the salted
        # plan's small partitions — both mask the curve under test; in
        # production AQE is the FIRST defense, session.py enables it).
        old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        old_part = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        dim = spark.range(1001).select(
            F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("attr")
        ).localCheckpoint()
        salted_flat: list[float] = []
        sk_rungs = [100_000, 1_000_000, 10_000_000] if "skew" in pick else []
        if "skew_xl" in pick:
            sk_rungs = sk_rungs + [100_000_000]
        try:
            for n in sk_rungs:
                # reducers sized the way a cluster sizes them: ~31k rows
                # per task; salt buckets 8x that so the hot key can land
                # on every reducer
                n_part = max(4, n // 31_250)
                buckets = 8 * n_part
                spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
                fact = spark.range(n).select(
                    F.when(F.pmod(F.col("id"), F.lit(10)) < 7, F.lit(0))
                    .otherwise(F.pmod(F.xxhash64("id"), F.lit(1000)) + 1)
                    .alias("k"),
                    F.md5(F.col("id").cast("string")).alias("payload"),
                ).localCheckpoint()
                counts = {}
                variants = [
                    ("plain", fact.join(dim, "k")),
                    ("salted", skew.salted_join(fact, dim, "k", buckets=buckets)),
                ]
                if "skew_aqe" in pick:
                    # the production first-defense path, measured too:
                    # the SAME plain join with AQE's skew-split active
                    # (runtime broadcast still off — the dim is
                    # broadcast-ineligible in the modeled regime).
                    # Expectation: below the 256 MB
                    # skewedPartitionThresholdInBytes the hot partition
                    # is NOT split (the 10M rung's ~238 MB rides just
                    # under it), above it AQE splits to ~advisory-sized
                    # chunks — the knob boundary salting does not have.
                    variants.append(("aqe", fact.join(dim, "k")))
                for label, df in variants:
                    if label == "aqe":
                        spark.conf.set("spark.sql.adaptive.enabled", "true")
                        spark.conf.set(
                            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
                        )
                    ids0 = _completed_stage_ids()
                    sw0, _ = bench._stage_bytes(spark)
                    t = time.time()
                    # the probe aggregate must CONSUME every column —
                    # a bare count() lets Catalyst prune payload+attr
                    # out of the exchanges, and 7M identical hot keys
                    # alone lz4-compress to ~nothing, hiding the hot
                    # task (measured: 0.8 MB vs the real ~150 MB). The
                    # decimal hash-sum doubles as value-level parity
                    # between the two plans, not just row-count parity.
                    counts[label] = tuple(
                        df.agg(
                            F.count(F.lit(1)),
                            F.sum(F.length("payload")),
                            F.sum(
                                F.xxhash64("k", "payload", "attr").cast(
                                    "decimal(38,0)"
                                )
                            ),
                        ).first()
                    )
                    wall = time.time() - t
                    sw1, _ = bench._stage_bytes(spark)
                    mx = _max_task_shuffle_read_mb(ids0)
                    out[f"skew_{label}_{n // 1000}k"] = {
                        "wall_s": round(wall, 2),
                        "shuffle_mb": round((sw1 - sw0) / 1e6, 1),
                        "max_task_shuffle_read_mb": mx,
                        "n_reducers": n_part,
                        **({"buckets": buckets} if label == "salted" else {}),
                    }
                    if label == "salted":
                        salted_flat.append(mx)
                    if label == "aqe":
                        spark.conf.set("spark.sql.adaptive.enabled", "false")
                        plain_mx = out[f"skew_plain_{n // 1000}k"][
                            "max_task_shuffle_read_mb"
                        ]
                        if plain_mx > 300 and n_part <= 2000:
                            # hot partition exceeds the 256 MB skew
                            # threshold and map statuses carry exact
                            # per-block sizes: AQE must have split it
                            assert mx < plain_mx / 2, (
                                f"skew_aqe_{n}: AQE did not split "
                                f"({mx} vs plain {plain_mx})"
                            )
                        elif plain_mx > 300:
                            # the r12 finding, pinned: past 2000 reduce
                            # partitions (minNumPartitionsToHighlyCompress)
                            # map statuses are HighlyCompressed — blocks
                            # under accurateBlockThreshold (100 MB) are
                            # AVERAGED, so each map's ~hot/maps MB
                            # contribution is invisible and AQE cannot
                            # see a multi-GB hot partition. Measured
                            # fix (separate sessions, static confs):
                            # accurateBlockSkewedFactor=5.0 OR
                            # accurateBlockThreshold=8m both restore
                            # the split (722.5 -> 44.6 MB max task at
                            # 30M rows x 3200 reducers). If this assert
                            # ever fails, a Spark upgrade changed the
                            # map-status regime — update SCALE.md.
                            assert mx > plain_mx / 2, (
                                f"skew_aqe_{n}: AQE split under compressed "
                                f"map statuses ({mx} vs plain {plain_mx}) — "
                                f"regime changed, update the SCALE.md note"
                            )
                        assert counts["aqe"] == counts["plain"], counts
                assert counts["plain"] == counts["salted"], counts
            # the ladder's claim, asserted from the recorded metric:
            # plain's hot task ~10x/decade, salted's max task ~flat
            # (across however many rungs this invocation ran)
            p = [out[f"skew_plain_{n // 1000}k"]["max_task_shuffle_read_mb"]
                 for n in sk_rungs]
            for lo, hi in zip(p, p[1:]):
                assert hi > 5 * lo, f"plain hot task not growing: {p}"
            assert max(salted_flat) <= 3 * max(salted_flat[0], 0.01), (
                f"salted max task not flat: {salted_flat}"
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
            spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
            spark.conf.set("spark.sql.shuffle.partitions", old_part)

    if pick & {"winsum", "winsum_xl"}:
        # The WINDOW analog of the skew ladder (opt-in; r13): per-key
        # running sum with a 70%-hot key, DIRECT keyed window vs the
        # decomposed skew.chunked_running_sum. Same per-MAX-TASK metric:
        # the direct plan's hot key is ONE window partition no matter how
        # many reducers exist (its task's shuffle-read grows 10x/decade,
        # and past executor memory it becomes the pressure-probe window
        # rung's spill-and-exact posture), while the chunked plan's max
        # task tracks rows/partitions (~flat). Value parity asserted per
        # rung via count + sum + decimal hash-sum. AQE is OFF for the
        # ladder, same reason as the skew ladder: its partition
        # COALESCING deliberately packs the chunked plan's many small
        # partitions toward the 64 MB advisory size (measured: a 49 MB
        # packed task at the 100M rung — healthy behavior that is not a
        # hot partition), which masks the per-task layout curve under
        # test; AQE's skew split could not help the DIRECT variant
        # anyway (it is join-only — a window partition is unsplittable).
        # winsum_xl adds the 100M rung (the direct variant sorts a
        # 70M-row partition in one task — minutes + GB of natural
        # spill).
        old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        old_part = spark.conf.get("spark.sql.shuffle.partitions")
        ws_rungs = [1_000_000, 10_000_000] if "winsum" in pick else []
        if "winsum_xl" in pick:
            ws_rungs = ws_rungs + [100_000_000]
        from pyspark.sql.window import Window

        direct_tasks: list[float] = []
        chunked_tasks: list[float] = []
        try:
            for n in ws_rungs:
                n_part = max(4, n // 31_250)
                spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
                fact = spark.range(n).select(
                    F.when(F.pmod(F.col("id"), F.lit(10)) < 7, F.lit(0))
                    .otherwise(F.pmod(F.xxhash64("id"), F.lit(1000)) + 1)
                    .alias("u"),
                    F.col("id").alias("t"),
                    F.pmod(F.col("id"), F.lit(97)).alias("v"),
                ).localCheckpoint()
                width = max(1, n // (8 * n_part))  # ~8 chunks per reducer
                direct = fact.withColumn(
                    "rs",
                    F.sum("v").over(
                        Window.partitionBy("u")
                        .orderBy("t")
                        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
                    ),
                )
                chunked = skew.chunked_running_sum(
                    fact, "u", [F.col("t")], "v", F.expr(f"t div {width}"), "rs"
                )
                vals = {}
                for label, df in (("direct", direct), ("chunked", chunked)):
                    ids0 = _completed_stage_ids()
                    sw0, _ = bench._stage_bytes(spark)
                    t0 = time.time()
                    vals[label] = tuple(
                        df.agg(
                            F.count(F.lit(1)),
                            F.sum("rs"),
                            F.sum(
                                F.xxhash64("u", "t", "rs").cast("decimal(38,0)")
                            ),
                        ).first()
                    )
                    wall = time.time() - t0
                    sw1, _ = bench._stage_bytes(spark)
                    mx = _max_task_shuffle_read_mb(ids0)
                    out[f"winsum_{label}_{n // 1000}k"] = {
                        "wall_s": round(wall, 2),
                        "shuffle_mb": round((sw1 - sw0) / 1e6, 1),
                        "max_task_shuffle_read_mb": mx,
                        "n_reducers": n_part,
                    }
                    (direct_tasks if label == "direct" else chunked_tasks).append(mx)
                assert vals["direct"] == vals["chunked"], vals
            for lo, hi in zip(direct_tasks, direct_tasks[1:]):
                assert hi > 5 * lo, (
                    f"direct hot window task not growing: {direct_tasks}"
                )
            assert max(chunked_tasks) <= 3 * max(chunked_tasks[0], 0.01), (
                f"chunked max task not flat: {chunked_tasks}"
            )
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
            spark.conf.set("spark.sql.shuffle.partitions", old_part)

    if "winsum_width" in pick:
        # Chunk-WIDTH tuning law for the decomposed hot-key window
        # (r13): correctness is width-invariant (pinned in
        # tests/test_skew.py at widths 1/37/1e9), but the max-task curve
        # is U-shaped. Too-WIDE chunks under-spread the hot key (the
        # intra-chunk window re-concentrates: max task ~ 0.7*width *
        # row_bytes); too-NARROW chunks turn the OFFSET window into the
        # hot partition (partitionBy(key) orderBy(chunk) puts all of a
        # key's ~n/width offset rows in ONE task). The ~8-chunks-per-
        # reducer default sits on the wide plateau between the cliffs:
        # max_task ~ max(0.7*width*row_B, (n/width)*offset_B), minimized
        # near width* = sqrt(n*offset_B/(0.7*row_B)) — but the flat
        # bottom spans ~3 decades, which is why the knob is safe to set
        # by rule of thumb. Value parity vs the DIRECT window asserted
        # at every width. Same AQE-off rationale as winsum.
        old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        old_part = spark.conf.get("spark.sql.shuffle.partitions")
        from pyspark.sql.window import Window

        n = 10_000_000
        n_part = max(4, n // 31_250)
        spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
        try:
            fact = spark.range(n).select(
                F.when(F.pmod(F.col("id"), F.lit(10)) < 7, F.lit(0))
                .otherwise(F.pmod(F.xxhash64("id"), F.lit(1000)) + 1)
                .alias("u"),
                F.col("id").alias("t"),
                F.pmod(F.col("id"), F.lit(97)).alias("v"),
            ).localCheckpoint()
            expected = tuple(
                fact.withColumn(
                    "rs",
                    F.sum("v").over(
                        Window.partitionBy("u")
                        .orderBy("t")
                        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
                    ),
                )
                .agg(
                    F.count(F.lit(1)),
                    F.sum("rs"),
                    F.sum(F.xxhash64("u", "t", "rs").cast("decimal(38,0)")),
                )
                .first()
            )
            default_w = max(1, n // (8 * n_part))
            widths = [n // 4, n // 64, default_w, 64, 4]
            curve: dict[int, float] = {}
            for w in widths:
                chunked = skew.chunked_running_sum(
                    fact, "u", [F.col("t")], "v", F.expr(f"t div {w}"), "rs"
                )
                ids0 = _completed_stage_ids()
                sw0, _ = bench._stage_bytes(spark)
                t0 = time.time()
                got = tuple(
                    chunked.agg(
                        F.count(F.lit(1)),
                        F.sum("rs"),
                        F.sum(F.xxhash64("u", "t", "rs").cast("decimal(38,0)")),
                    ).first()
                )
                wall = time.time() - t0
                sw1, _ = bench._stage_bytes(spark)
                mx = _max_task_shuffle_read_mb(ids0)
                assert got == expected, (w, got, expected)
                curve[w] = mx
                out[f"winsum_width_{w}"] = {
                    "wall_s": round(wall, 2),
                    "shuffle_mb": round((sw1 - sw0) / 1e6, 1),
                    "max_task_shuffle_read_mb": mx,
                    "chunks_per_key": n // w,
                    "n_reducers": n_part,
                }
            # the U shape: both extremes concentrate >3x over the default
            assert curve[widths[0]] > 3 * curve[default_w], curve
            assert curve[4] > 3 * curve[default_w], curve
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
            spark.conf.set("spark.sql.shuffle.partitions", old_part)

    if "skew_aqe_engine" in pick:
        # The r12 AQE-blindness mitigation, asserted at the CONF BOUNDARY:
        # this run's session came from session.get_spark (see the builder
        # branch above), so the assert fails if a session.py refactor ever
        # drops the accurateBlockSkewedFactor default — the exact regime
        # where skew_aqe pins the bare session as BLIND (3200 reducers >
        # minNumPartitionsToHighlyCompress=2000, per-map hot contribution
        # under accurateBlockThreshold) must now SPLIT.
        factor = spark.sparkContext.getConf().get(
            "spark.shuffle.accurateBlockSkewedFactor", ""
        )
        assert factor == "5.0", (
            f"engine session does not carry accurateBlockSkewedFactor=5.0 "
            f"(got {factor!r}) — session.py lost the r12 mitigation"
        )
        assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
        old_part = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.shuffle.partitions", "3200")
        try:
            n = 30_000_000
            dim = spark.range(1001).select(
                F.col("id").alias("k"),
                F.md5(F.col("id").cast("string")).alias("attr"),
            ).localCheckpoint()
            fact = spark.range(n).select(
                F.when(F.pmod(F.col("id"), F.lit(10)) < 7, F.lit(0))
                .otherwise(F.pmod(F.xxhash64("id"), F.lit(1000)) + 1)
                .alias("k"),
                F.md5(F.col("id").cast("string")).alias("payload"),
            ).localCheckpoint()
            counts = {}
            for label, aqe in (("plain", "false"), ("engine_aqe", "true")):
                spark.conf.set("spark.sql.adaptive.enabled", aqe)
                ids0 = _completed_stage_ids()
                t = time.time()
                # consume every column (a bare count() lets Catalyst prune
                # the payload out of the exchanges — the r12 probe lesson)
                counts[label] = tuple(
                    fact.join(dim, "k").agg(
                        F.count(F.lit(1)),
                        F.sum(F.length("payload")),
                        F.sum(F.xxhash64("k", "payload", "attr").cast("decimal(38,0)")),
                    ).first()
                )
                mx = _max_task_shuffle_read_mb(ids0)
                out[f"skew_aqe_engine_{label}"] = {
                    "wall_s": round(time.time() - t, 2),
                    "max_task_shuffle_read_mb": mx,
                    "n_reducers": 3200,
                }
            assert counts["plain"] == counts["engine_aqe"], counts
            plain_mx = out["skew_aqe_engine_plain"]["max_task_shuffle_read_mb"]
            aqe_mx = out["skew_aqe_engine_engine_aqe"]["max_task_shuffle_read_mb"]
            assert plain_mx > 300, (
                f"vacuous: hot partition only {plain_mx} MB — below AQE's "
                f"256 MB skew threshold, the split assert proves nothing"
            )
            assert aqe_mx < plain_mx / 2, (
                f"engine session did NOT split the hot partition at 3200 "
                f"reducers ({aqe_mx} vs plain {plain_mx} MB) — the "
                f"accurateBlockSkewedFactor mitigation is not effective"
            )
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.shuffle.partitions", old_part)
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

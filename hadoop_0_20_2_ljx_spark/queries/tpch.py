"""Declared queries: all 22 TPC-H query shapes (Q1-Q22) over the star schema.

The reference's users run exactly these report shapes as hand-rolled
MapReduce chains (join job -> agg job -> sort job via
mapred/jobcontrol/JobControl.java:141, with the join halves built on
mapred/lib/CompositeInputFormat-style tagged inputs); Q1 landed in round
1 (queries/agg.py q_agg_tpch_q1). Here each is ONE declarative plan so
Catalyst picks the physical strategy: broadcast the filtered customer
dim, push the date filters into the parquet scan, partial-agg before
every exchange.

Cross-engine determinism: revenue aggregates are integer CENTS — each
row's extended revenue is rounded to cents FIRST (identical doubles in
both engines -> identical cents), then summed as BIGINT, which is
order-independent; a raw double sum ordered differently per engine
would flip the top-k selection at the rounding boundary. Top-k
orderings carry an explicit unique-key tiebreak (queries/base.py rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_0_20_2_ljx_spark.queries.base import QueryDef, T
from hadoop_0_20_2_ljx_spark.pinning import pin


def _rev_cents(price: str, disc: str) -> F.Column:
    return F.round(F.col(price) * (1 - F.col(disc)) * 100, 0).cast("long")


# --- Q3: shipping-priority top-10 -------------------------------------------
def _tpch_q3(spark: SparkSession, sf: str) -> DataFrame:
    """Unshipped high-value BUILDING orders: 2 joins + agg + top-10.
    The customer projection (1 segment, key column only) carries NO
    broadcast hint: customer scales linearly with SF, so Catalyst picks
    BHJ under autoBroadcastJoinThreshold (every test SF) and falls back
    to a shuffle join at cluster scale instead of OOMing on a forced
    broadcast — same policy as Q5's SF-linear dims. Both date filters
    push to the scans; TakeOrderedAndProject caps the sort at k=10."""
    cust = (
        T(spark, sf, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        T(spark, sf, "orders")
        .where(F.col("o_orderdate") < F.lit("1998-01-01"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        T(spark, sf, "lineitem")
        .where(F.col("l_shipdate") > F.lit("1998-01-01"))
        .select("l_orderkey", _rev_cents("l_extendedprice", "l_discount").alias("_rc"))
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        cust, orders.o_custkey == cust.c_custkey
    )
    agg = j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum("_rc").cast("long").alias("revenue_cents")
    )
    return (
        agg.orderBy(F.col("revenue_cents").desc(), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            "revenue_cents",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


_Q3_SQL = """
SELECT l_orderkey,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_cents DESC, l_orderkey
LIMIT 10
"""


# --- Q6: forecast-revenue-change scan ---------------------------------------
def _tpch_q6(spark: SparkSession, sf: str) -> DataFrame:
    """Pure filter+scalar-agg — the pushdown showcase: all three
    predicates reach the parquet scan (PushedFilters), the projection
    prunes to 4 columns, and the single-row answer needs no shuffle at
    all (partial sums -> one final reduce)."""
    li = T(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(F.round(F.col("l_extendedprice") * F.col("l_discount") * 100, 0).cast("long"))
        .cast("long")
        .alias("revenue_cents"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


_Q6_SQL = """
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# --- Q18: large-volume customers --------------------------------------------
_Q18_MIN_QTY = 190


def _tpch_q18(spark: SparkSession, sf: str) -> DataFrame:
    """Orders whose total quantity exceeds a threshold, with their
    customer: the agg-then-semi-join shape. The qualifying-order set is
    computed by a partial-agg groupBy on lineitem (never a correlated
    subquery per row) and re-joined; customer joins on the already
    thinned order rows. l_quantity is integer-valued, so the HAVING
    comparison and the output sum are exact in both engines."""
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .where(F.col("total_qty") > _Q18_MIN_QTY)
    )
    orders = T(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = T(spark, sf, "customer").select("c_custkey", "c_name")
    j = big.join(orders, big.l_orderkey == orders.o_orderkey).join(
        cust, orders.o_custkey == cust.c_custkey
    )
    return (
        j.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


_Q18_SQL = f"""
WITH big AS (
  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > {_Q18_MIN_QTY}
)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice, total_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


QUERIES: dict[str, QueryDef] = {
    "q_agg_tpch_q3": QueryDef(
        _tpch_q3,
        _Q3_SQL,
        "TPC-H Q3 shape: 2 equi-joins (customer unhinted — Catalyst "
        "BHJ locally, shuffle join at scale) + partial agg + "
        "TakeOrderedAndProject top-10; integer-cent revenue",
    ),
    "q_agg_tpch_q6": QueryDef(
        _tpch_q6,
        _Q6_SQL,
        "TPC-H Q6 shape: full-pushdown filter scan to a 1-row answer; "
        "integer-cent revenue",
    ),
    "q_agg_tpch_q18": QueryDef(
        _tpch_q18,
        _Q18_SQL,
        "TPC-H Q18 shape: lineitem agg -> qualifying-order join -> "
        "customer join -> top-100 with unique-key tiebreak",
    ),
}


# --- Q5: local-supplier volume (6-table join) --------------------------------
def _tpch_q5(spark: SparkSession, sf: str) -> DataFrame:
    """Revenue by nation where customer and supplier are co-national: the
    join-ordering showcase. Only region and nation carry broadcast()
    hints — they are constant-size (5/25 rows at every SF). customer and
    supplier scale linearly with SF, so they get NO hint: Catalyst picks
    BHJ for them under autoBroadcastJoinThreshold (every test SF) and
    falls back to a shuffle join at cluster scale instead of OOMing the
    executors on a forced broadcast. The fact tables shuffle once; the
    constant dims never do."""
    region = T(spark, sf, "region").where(F.col("r_name") == "ASIA").select("r_regionkey")
    nation = T(spark, sf, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    cust = T(spark, sf, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_nationkey", "n_name")
    supp = T(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    orders = (
        T(spark, sf, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = T(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", _rev_cents("l_extendedprice", "l_discount").alias("_rc")
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    return (
        j.groupBy("n_name")
        .agg(
            F.sum("_rc").cast("long").alias("revenue_cents"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


_Q5_SQL = """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_items
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""

QUERIES["q_agg_tpch_q5"] = QueryDef(
    _tpch_q5,
    _Q5_SQL,
    "TPC-H Q5 shape: 6-table join; constant dims (region/nation) hinted "
    "broadcast, SF-linear dims (customer/supplier) left to Catalyst so "
    "the plan degrades to shuffle joins at scale instead of OOM",
)


# --- market-basket co-occurrence (co-purchased part pairs) -------------------
def _agg_copurchase(spark: SparkSession, sf: str) -> DataFrame:
    """Top co-purchased part pairs by support — the market-basket /
    recommendation workload. Shape: per-order distinct items first
    (row-local dedup bounds the pair explosion at sum(n_i^2) with n_i =
    items per order, ~13 max here — never corpus x corpus), equi-join on
    the order key, partial-agg count, TakeOrderedAndProject top-k with
    full tie-break. Item ids folded mod 1000 so pairs actually repeat at
    fixture scale."""
    items = T(spark, sf, "lineitem").select(
        "l_orderkey", (F.col("l_partkey") % 1000).alias("p")
    )
    # r13: per-order pair enumeration via sorted item sets instead of the
    # distinct + equi-self-join — the membership-set idiom from
    # group_similarity_matrix. ONE shuffle of (orderkey, p) with map-side
    # collect_set dedup replaces two distinct-side exchanges + the join
    # (the self-join also re-scanned lineitem per side: Catalyst never
    # dedupes common subplans). Pairs are emitted partition-locally via
    # posexplode + tail-slice over the sorted set, so pa < pb holds by
    # construction and each order contributes each pair exactly once —
    # identical support counts. NULL handling pins the join semantics the
    # rewrite replaces: the bare equi-join dropped NULL order keys (NULL
    # never matches), so the explicit not-null filter keeps that contract
    # where groupBy would keep a NULL group (the r10 null-join class);
    # NULL p never paired under pa < pb, and collect_set drops it — same.
    sets_ = (
        items.where(F.col("l_orderkey").isNotNull())
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p")).alias("ps"))
    )
    pairs = sets_.select("ps", F.posexplode("ps").alias("_i", "pa")).select(
        "pa",
        F.explode(F.slice(F.col("ps"), F.col("_i") + 2, F.size("ps"))).alias("pb"),
    )
    return (
        pairs.groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .orderBy(F.col("support").desc(), "pa", "pb")
        .limit(1000)
    )


_COPURCHASE_SQL = """
WITH i AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey % 1000 AS p FROM lineitem
)
SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS support
FROM i a JOIN i b ON a.o = b.o AND a.p < b.p
GROUP BY 1, 2
ORDER BY support DESC, pa, pb
LIMIT 1000
"""

QUERIES["q_agg_copurchase"] = QueryDef(
    _agg_copurchase,
    _COPURCHASE_SQL,
    "market-basket co-occurrence: row-local item dedup bounds the pair "
    "explosion; top-k by support with full tie-break",
)


# --- item-item cosine similarity from co-occurrence --------------------------
def _agg_item_sim(spark: SparkSession, sf: str) -> DataFrame:
    """Item-item cosine similarity over the order/item incidence matrix
    (the classic co-occurrence recommender): sim(a,b) = support(a,b) /
    sqrt(freq(a)*freq(b)), reported in integer basis points —
    floor(1e4 * s / sqrt(fa*fb)) of identical integers is bit-exact
    cross-engine. Shape: the copurchase pair join (row-local basket
    dedup bounds it) + the item-frequency table re-entering unhinted
    (catalog-sized, so Catalyst/AQE broadcasts while it fits and
    shuffle-joins past that); top-500 with full tie-break."""
    items = (
        T(spark, sf, "lineitem")
        .select("l_orderkey", (F.col("l_partkey") % 1000).alias("p"))
        .distinct()
        .transform(pin)  # feeds pair join (twice) + freq table
    )
    freq = items.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("f"))
    a = items.select(F.col("l_orderkey").alias("o"), F.col("p").alias("pa"))
    b = items.select(F.col("l_orderkey").alias("o"), F.col("p").alias("pb"))
    pairs = (
        a.join(b, "o")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    fa = freq.select(F.col("p").alias("pa"), F.col("f").alias("fa"))
    fb = freq.select(F.col("p").alias("pb"), F.col("f").alias("fb"))
    # no broadcast hint: the frequency table is catalog-sized (distinct
    # items), which grows with the corpus — the same SF-linear class the
    # Q3/Q5 dims fell into. Catalyst/AQE picks BHJ whenever it fits the
    # threshold (it does at every test SF — plan-pinned) and degrades to
    # a shuffle join past it instead of OOMing the driver.
    sim = pairs.join(fa, "pa").join(fb, "pb")
    sim_bp = F.floor(
        F.lit(10000.0) * F.col("support")
        # cast each factor BEFORE multiplying: a BIGINT fa*fb overflows
        # past ~3e9-row item frequencies (ANSI error at scale); the
        # double product is exact for the comparison-relevant range and
        # feeds sqrt anyway
        / F.sqrt(F.col("fa").cast("double") * F.col("fb").cast("double"))
    ).cast("long")
    return (
        sim.select("pa", "pb", "support", sim_bp.alias("sim_bp"))
        .orderBy(F.col("sim_bp").desc(), "pa", "pb")
        .limit(500)
    )


_ITEM_SIM_SQL = """
WITH i AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey % 1000 AS p FROM lineitem
), f AS (
  SELECT p, CAST(count(*) AS BIGINT) AS f FROM i GROUP BY 1
), pairs AS (
  SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS support
  FROM i a JOIN i b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2
)
SELECT pa, pb, support,
       CAST(floor(10000.0 * support / sqrt(CAST(fa.f * fb.f AS DOUBLE))) AS BIGINT)
         AS sim_bp
FROM pairs JOIN f fa ON pa = fa.p JOIN f fb ON pb = fb.p
ORDER BY sim_bp DESC, pa, pb
LIMIT 500
"""

QUERIES["q_agg_item_sim"] = QueryDef(
    _agg_item_sim,
    _ITEM_SIM_SQL,
    "item-item cosine similarity from co-occurrence (basis points, "
    "bit-exact): bounded pair join + broadcast frequency re-entry",
)


# --- Q4: order-priority checking (EXISTS decorrelation) ----------------------
def _tpch_q4(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: count orders per priority where EXISTS a
    qualifying lineitem — the correlated-EXISTS decorrelation showcase.
    The fixture lacks commit/receipt dates, so the qualifying predicate
    is a returned line (l_returnflag = 'R'), preserving the shape: a
    per-row correlated subquery decorrelates to ONE left-semi join on
    the order key (DISTINCT is free — semi join emits each left row at
    most once), with the date filter pushed to the orders scan. The
    reference expressed this as a two-job chain: a reduce-side join job
    emitting matched order keys, then a count job
    (examples/.../Join.java pattern + JobControl chaining)."""
    orders = (
        T(spark, sf, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1996-07-01"))
        )
        .select("o_orderkey", "o_orderpriority")
    )
    flagged = (
        T(spark, sf, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(flagged, orders.o_orderkey == flagged.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


_Q4_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""

QUERIES["q_agg_tpch_q4"] = QueryDef(
    _tpch_q4,
    _Q4_SQL,
    "TPC-H Q4 shape: correlated EXISTS decorrelated to one left-semi "
    "join + partial-agg count (oracle keeps the correlated form)",
)


# --- Q10: returned-item revenue by customer (top-k report join) --------------
def _tpch_q10(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer in a
    quarter, top-20. lineitem('R') >< orders(date window) shuffle on the
    order key; the per-customer aggregate happens BEFORE the customer
    and nation joins, so the dims join the k-bounded aggregate, not the
    fact stream (agg-then-join, same discipline as Q18); nation is a
    25-row broadcast. Integer-cent revenue; top-20 tie-broken on the
    unique customer key."""
    returned = (
        T(spark, sf, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", _rev_cents("l_extendedprice", "l_discount").alias("_rc"))
    )
    orders = (
        T(spark, sf, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1996-07-01"))
        )
        .select("o_orderkey", "o_custkey")
    )
    per_cust = (
        returned.join(orders, returned.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("_rc").cast("long").alias("revenue_cents"))
    )
    cust = T(spark, sf, "customer").select(
        "c_custkey", "c_name", "c_nationkey", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    nation = T(spark, sf, "nation").select("n_nationkey", "n_name")
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .orderBy(F.col("revenue_cents").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue_cents", "n_name", "c_acctbal")
    )


_Q10_SQL = """
SELECT c_custkey, c_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       n_name, round(c_acctbal, 2) AS c_acctbal
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue_cents DESC, c_custkey
LIMIT 20
"""

QUERIES["q_agg_tpch_q10"] = QueryDef(
    _tpch_q10,
    _Q10_SQL,
    "TPC-H Q10 shape: returns-revenue top-20 — agg-then-join (dims join "
    "the aggregate, not the fact stream), 25-row nation broadcast, "
    "integer-cent revenue with unique-key tiebreak",
)


# --- Q2: min-cost supplier (correlated scalar-agg decorrelation) -------------
def _tpch_q2(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the EUROPE supplier(s)
    offering the minimum cost — the correlated SCALAR-AGG subquery
    (cost = (SELECT min(cost) ... WHERE partkey = outer.partkey))
    decorrelated into groupBy-min + re-join. The fixture has no
    partsupp, so the (part, supplier) cost table derives from lineitem:
    min observed sale cents per pair — same cardinality class
    (|parts|×avg suppliers/part), preserving the optimizer shape.

    Decorrelation: ONE groupBy(partkey).min over the region-eligible
    cost table, equi-joined back on (partkey, cost = min_cost) — never a
    per-row subquery (plan-pinned: equi-joins only). The reference ran
    this as the manual two-job min-then-join chain
    (examples/.../Join.java:74-145 + JobControl): job 1 reduces to the
    per-part min, job 2 reduce-side joins it against the pairs.

    Scale: the cost table partial-aggs out of lineitem (combiner) and
    shuffles on (partkey, suppkey); supplier/nation/region prune it
    BEFORE the min (smaller agg state); nation×region is a broadcast
    of constant dims; part is SF-linear so its join is unhinted.
    Determinism: costs are integer cents; ordering tie-breaks on the
    unique (p_partkey, s_suppkey) pair."""
    ps = (
        T(spark, sf, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
        )
        .agg(
            F.min(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
                "cost_cents"
            )
        )
    )
    nat = (
        T(spark, sf, "nation")
        .join(
            T(spark, sf, "region").where(F.col("r_name") == "EUROPE"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = T(spark, sf, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", F.round("s_acctbal", 2).alias("s_acctbal")
    )
    elig = (
        ps.join(supp, ps.suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == F.col("n_nationkey"))
        .select("partkey", "suppkey", "cost_cents", "s_name", "s_acctbal", "n_name")
        .transform(pin)  # consumed twice: min table + re-join probe
    )
    min_cost = (
        elig.groupBy("partkey")
        .agg(F.min("cost_cents").alias("_mc"))
        .withColumnRenamed("partkey", "_mk")  # self-join disambiguation
    )
    part = (
        T(spark, sf, "part")
        .where(F.col("p_size") == 15)
        .select("p_partkey", "p_name")
    )
    return (
        elig.join(
            min_cost,
            (F.col("partkey") == F.col("_mk")) & (F.col("cost_cents") == F.col("_mc")),
        )
        .drop("_mk", "_mc")
        .join(part, F.col("partkey") == part.p_partkey)
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey", "suppkey")
        .limit(100)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("suppkey").alias("s_suppkey"),
            "cost_cents",
        )
    )


_Q2_SQL = """
WITH ps AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         CAST(min(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cost_cents
  FROM lineitem GROUP BY 1, 2
), elig AS (
  SELECT partkey, suppkey, cost_cents, s_name,
         round(s_acctbal, 2) AS s_acctbal, n_name
  FROM ps
  JOIN supplier ON suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       suppkey AS s_suppkey, cost_cents
FROM elig
JOIN part ON partkey = p_partkey
WHERE p_size = 15
  AND cost_cents = (SELECT min(e2.cost_cents) FROM elig e2
                    WHERE e2.partkey = elig.partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
LIMIT 100
"""

QUERIES["q_agg_tpch_q2"] = QueryDef(
    _tpch_q2,
    _Q2_SQL,
    "TPC-H Q2 shape: correlated scalar-agg subquery decorrelated to "
    "groupBy-min + equi-re-join (oracle keeps the correlated form); "
    "lineitem-derived partsupp surrogate, integer-cent costs",
)


# --- Q19: disjunctive-predicate join (OR-of-ANDs equi-key extraction) --------
def _tpch_q19(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from lineitem><part where an OR of three
    AND-groups (brand × size band × quantity band) qualifies the pair —
    the disjunctive-predicate showcase. Naively each OR arm correlates
    both sides and a row-at-a-time engine nest-loops it; Catalyst
    extracts the COMMON equi-key (l_partkey = p_partkey) so the join is
    a plain hash join with the OR as a residual filter — plan-pinned: no
    BroadcastNestedLoopJoin/CartesianProduct. The fixture lacks
    p_container/l_shipmode, so the arms use p_brand/p_size/l_quantity —
    same predicate structure. The reference would run this as a
    reduce-side join with the OR evaluated in the reducer
    (mapred/join/CompositeRecordReader tagged-value pattern).

    Scale: part is SF-linear and unhinted (BHJ locally, shuffle join at
    cluster scale); only l_partkey/l_quantity/price/discount are read
    (column pruning); the single-row answer is a partial-sum reduce."""
    li = T(spark, sf, "lineitem").select(
        "l_partkey",
        "l_quantity",
        _rev_cents("l_extendedprice", "l_discount").alias("_rc"),
    )
    part = T(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    arm = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(part, (F.col("l_partkey") == F.col("p_partkey")) & arm)
        .agg(
            F.sum("_rc").cast("long").alias("revenue_cents"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


_Q19_SQL = """
SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""

QUERIES["q_agg_tpch_q19"] = QueryDef(
    _tpch_q19,
    _Q19_SQL,
    "TPC-H Q19 shape: OR-of-ANDs disjunctive join predicate — common "
    "equi-key extracted to a hash join, OR residual-filtered "
    "(plan-pinned no nested loop); integer-cent revenue",
)


# --- Q16: supplier diversity per part class (NOT IN anti-join) ---------------
def _tpch_q16(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size)
    for qualifying parts, EXCLUDING suppliers on a complaint list — the
    NOT IN subquery decorrelated to a left-anti join. The fixture has no
    partsupp/comment, so pairs come from distinct lineitem
    (l_partkey, l_suppkey) and the exclusion is s_acctbal < 0 (the
    reference's complaint scan over supplier comments). The anti side is
    tiny and broadcasts; count(DISTINCT) plans as the two-phase
    partial/final distinct aggregate, never a driver collect.

    Determinism: counts are exact integers; ordering tie-breaks through
    the full (cnt desc, brand, type, size) key, which is unique."""
    ps = (
        T(spark, sf, "lineitem")
        .select(F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"))
        .distinct()
    )
    complaints = (
        T(spark, sf, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    part = (
        T(spark, sf, "part")
        .where(
            (F.col("p_brand") != "Brand#13")
            & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        ps.join(complaints, ps.suppkey == complaints.s_suppkey, "left_anti")
        .join(part, ps.partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size, CAST(count(DISTINCT suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey FROM lineitem) ps
JOIN part ON partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

QUERIES["q_agg_tpch_q16"] = QueryDef(
    _tpch_q16,
    _Q16_SQL,
    "TPC-H Q16 shape: NOT IN decorrelated to a broadcast anti-join + "
    "two-phase count-distinct per part class (oracle keeps NOT IN)",
)


# --- Q14: promo revenue share (conditional-aggregate ratio) ------------------
def _tpch_q14(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: the share of a month's revenue from PROMO parts
    — one join + a conditional aggregate pair reduced to a single-row
    ratio. The ratio is integer-exact cross-engine: both revenue sums
    are BIGINT cents and the ppm share is their integer division in
    DECIMAL(38,0) (a float 1e6*x/y loses exactness past 2^53 cents —
    ~$90M promo revenue — which a 100 TB month exceeds)."""
    li = (
        T(spark, sf, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-03-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .select("l_partkey", _rev_cents("l_extendedprice", "l_discount").alias("_rc"))
    )
    part = T(spark, sf, "part").select("p_partkey", "p_type")
    agg = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", F.col("_rc")).otherwise(0))
            .cast("long")
            .alias("promo_cents"),
            F.sum("_rc").cast("long").alias("total_cents"),
        )
    )
    return agg.select(
        "promo_cents",
        "total_cents",
        F.expr(
            "CAST((CAST(promo_cents AS DECIMAL(38,0)) * 1000000) div total_cents AS BIGINT)"
        ).alias("promo_ppm"),
    )


_Q14_SQL = """
WITH a AS (
  SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                  THEN CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS promo_cents,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
           AS total_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
)
SELECT promo_cents, total_cents,
       CAST((1000000 * CAST(promo_cents AS HUGEINT)) // total_cents AS BIGINT) AS promo_ppm
FROM a
"""

QUERIES["q_agg_tpch_q14"] = QueryDef(
    _tpch_q14,
    _Q14_SQL,
    "TPC-H Q14 shape: conditional-aggregate ratio (promo revenue share) "
    "— integer-cent sums, ppm share via DECIMAL integer division",
)


# --- Q13: customer order-count distribution (outer-join double agg) ----------
def _tpch_q13(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed 0, 1, 2, ... orders
    (excluding a priority class) — the outer-join double-aggregation
    showcase. The naive plan LEFT-OUTER joins the customer dim against
    the raw orders fact and counts per customer; at 100 TB that streams
    every order row through the join. Here the fact aggregates FIRST
    (groupBy o_custkey count, map-side partials), so the outer join sees
    one row per ordering customer — bounded by |customers| — and the
    no-order customers surface as NULL -> 0 via coalesce. The second
    aggregate (distribution of counts) is tiny (<100 groups). The
    reference ran this as a two-job chain: a reduce-side outer join
    emitting (cust, n) with zero-fill, then a count job keyed on n
    (mapred/lib/CompositeInputFormat outer() semantics + JobControl,
    mapred/join/OuterJoinRecordReader.java:34).

    Determinism: pure integer counts; ordering (custdist DESC, c_count
    DESC) is total because c_count is the unique group key."""
    per_cust = (
        T(spark, sf, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    cust = T(spark, sf, "customer").select("c_custkey")
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left_outer")
        .select(F.coalesce(F.col("_n"), F.lit(0).cast("long")).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_Q13_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

QUERIES["q_agg_tpch_q13"] = QueryDef(
    _tpch_q13,
    _Q13_SQL,
    "TPC-H Q13 shape: order-count-per-customer distribution — fact "
    "aggregates BEFORE the outer join (dim outer-joins the bounded "
    "aggregate, zero-fill via coalesce), then a tiny second aggregate",
)


# --- Q17: small-quantity threshold vs correlated per-part average ------------
def _tpch_q17(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lines whose quantity is below 20%
    of their part's average quantity — the correlated-AVG-over-the-
    same-table showcase (the subquery scans the very table being
    filtered). Decorrelated: ONE groupBy(l_partkey) computing
    (sum_qty, cnt) over the brand's lines, equi-joined back; the
    fractional threshold q < 0.2·(sum/cnt) is cross-multiplied to the
    exact integer test 5·q·cnt < sum (quantities are integral), so no
    engine ever divides — the boundary row lands identically in Spark
    and DuckDB where a double 0.2·avg could round either way. The
    reference expressed this as the two-job avg-then-filter chain
    (reduce to per-key means, re-join, filter — the same
    JobControl pattern as Q2's min, examples/.../Join.java:74-145).

    Scale: brand filter prunes part (SF-linear, unhinted — Catalyst
    BHJs below threshold, shuffle-joins beyond); the per-part stats
    aggregate partial-aggs out of the pruned lineitem stream; the
    stats table is bounded by |brand parts|. The pruned line set feeds
    both the stats and the probe -> pin() once."""
    parts_b = (
        T(spark, sf, "part")
        .where(F.col("p_brand") == "Brand#19")
        .select("p_partkey")
    )
    li = (
        T(spark, sf, "lineitem")
        .select(
            "l_partkey",
            F.col("l_quantity").cast("long").alias("_q"),
            F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("_pc"),
        )
        .join(parts_b, F.col("l_partkey") == parts_b.p_partkey)
        .drop("p_partkey")
        .transform(pin)  # consumed twice: per-part stats + probe
    )
    stats = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum("_q").alias("_sq"), F.count(F.lit(1)).alias("_cnt")
    )
    return (
        li.join(stats, li.l_partkey == F.col("_pk"))
        .where(F.lit(5) * F.col("_q") * F.col("_cnt") < F.col("_sq"))
        .agg(
            F.sum("_pc").cast("long").alias("revenue_cents"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


_Q17_SQL = """
SELECT CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
WHERE p_brand = 'Brand#19'
  AND 5 * CAST(l_quantity AS BIGINT)
        * (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
      < (SELECT CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
         FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
"""

QUERIES["q_agg_tpch_q17"] = QueryDef(
    _tpch_q17,
    _Q17_SQL,
    "TPC-H Q17 shape: correlated per-part AVG decorrelated to one "
    "groupBy stats + re-join; fractional threshold cross-multiplied to "
    "an exact integer test (oracle keeps the correlated form)",
)


# --- Q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS stack) ------
def _tpch_q21(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers whose line was the ONLY late one on a
    multi-supplier finalized order — the chained EXISTS / NOT-EXISTS
    showcase. The fixture lacks commit/receipt dates, so "late" adapts
    to shipped >90 days after the order date (l_shipdate vs
    o_orderdate), preserving the shape. Both correlated subqueries
    carry an INEQUALITY correlation (l2.l_suppkey <> l1.l_suppkey), so
    neither decorrelates to a plain semi/anti join; the distributed
    rewrite is per-order aggregates: n_supp = countDistinct(supplier)
    and n_late_supp = countDistinct(supplier | late). A late row
    qualifies iff n_supp >= 2 (EXISTS another supplier) and
    n_late_supp = 1 (the late-supplier set is exactly {this row's
    supplier}, since the row itself is late) — two equi-joins and one
    partial-aggable groupBy instead of two per-row subqueries. The
    reference could only express this as a three-job chain: join
    lineitem><orders, reduce per order computing the supplier/late
    sets, then re-join + count (mapred/jobcontrol/JobControl.java:141
    chaining; the per-order set reduce is the
    SecondarySort-grouped-values pattern, examples/SecondarySort.java).

    Scale: orders is SF-linear -> unhinted join; the order-key shuffle
    is reused by groupBy and re-join; the joined+flagged line set feeds
    both -> pin() once. countDistinct is two-phase (partial distinct).
    Determinism: integer counts; (numwait DESC, s_name) is total since
    s_name is the unique group key."""
    ord_f = (
        T(spark, sf, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    lif = (
        T(spark, sf, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(ord_f, F.col("l_orderkey") == ord_f.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
            .alias("_late"),
        )
        .transform(pin)  # consumed twice: per-order sets + probe
    )
    per_order = lif.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(F.when(F.col("_late"), F.col("l_suppkey"))).alias(
            "_n_late_supp"
        ),
    )
    waits = (
        lif.where(F.col("_late"))
        .join(per_order, F.col("l_orderkey") == F.col("_ok"))
        .where((F.col("_n_supp") >= 2) & (F.col("_n_late_supp") == 1))
        .select("l_suppkey")
    )
    supp = T(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        waits.join(supp, waits.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


_Q21_SQL = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""

QUERIES["q_agg_tpch_q21"] = QueryDef(
    _tpch_q21,
    _Q21_SQL,
    "TPC-H Q21 shape: chained EXISTS/NOT-EXISTS with inequality "
    "correlation rewritten to per-order distinct-supplier aggregates + "
    "re-join (oracle keeps both correlated subqueries)",
)


# --- Q22: dormant-customer opportunity (global scalar avg + anti-join) -------
def _tpch_q22(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: per-country count/total of above-average-balance
    customers who never placed an urgent order — the global-scalar-
    subquery + NOT-EXISTS showcase. (The fixture has no phone column,
    so country = c_nationkey over a fixed 7-country set, and the
    classic "no orders at all" anti-predicate — vacuous in this
    fixture, every customer has orders — adapts to "no 1-URGENT
    order", preserving the anti-join.) The scalar AVG filter
    cents > avg is cross-multiplied to the exact integer test
    cents·cnt > total (Q17's discipline — no engine divides, no
    float boundary). The 1-row (total, cnt) aggregate joins back as a
    keyless broadcast (the bm25 corpus-stats idiom); the anti-join
    runs FIRST so the scalar filter sees only order-less customers.
    The reference's analog: a side "averages" job whose single-record
    output rides DistributedCache into the filter map
    (core/filecache/DistributedCache.java:79-97), plus a reduce-side
    antijoin job.

    Determinism: integer cents throughout; cntrycode cast BIGINT on
    both sides; ordering on the unique group key."""
    nations = [8, 10, 13, 17, 18, 21, 23]
    cust = (
        T(spark, sf, "customer")
        .where(F.col("c_nationkey").isin(nations))
        .select(
            "c_custkey",
            F.col("c_nationkey").cast("long").alias("cntrycode"),
            F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("_cents"),
        )
        .transform(pin)  # consumed twice: global stats + probe
    )
    pos = cust.where(F.col("_cents") > 0).agg(
        F.sum("_cents").alias("_tot"), F.count(F.lit(1)).alias("_cnt")
    )
    urgent = (
        T(spark, sf, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .join(F.broadcast(pos))
        .where(F.col("_cents") * F.col("_cnt") > F.col("_tot"))
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum("_cents").cast("long").alias("totacctbal_cents"),
        )
        .orderBy("cntrycode")
    )


_Q22_SQL = """
WITH c AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS cntrycode,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer WHERE c_nationkey IN (8, 10, 13, 17, 18, 21, 23)
)
SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(cents) AS BIGINT) AS totacctbal_cents
FROM c c1
WHERE c1.cents * (SELECT count(*) FROM c c2 WHERE c2.cents > 0)
        > (SELECT CAST(sum(c2.cents) AS BIGINT) FROM c c2 WHERE c2.cents > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c1.c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY cntrycode
ORDER BY cntrycode
"""

QUERIES["q_agg_tpch_q22"] = QueryDef(
    _tpch_q22,
    _Q22_SQL,
    "TPC-H Q22 shape: global scalar-avg threshold (cross-multiplied "
    "integer test, keyless 1-row broadcast) + NOT-EXISTS anti-join "
    "(oracle keeps scalar subqueries + NOT EXISTS)",
)


# --- Q7: volume shipping between two nations (symmetric dim pair) ------------
def _tpch_q7(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape: revenue flowing between two nations in either
    direction, by ship year — the symmetric dim-pair disjunction. Both
    nation sides reduce to 1-row constant dims (broadcast-hinted, house
    policy); supplier and customer are SF-linear -> unhinted. The
    (n1=A and n2=B) OR (n1=B and n2=A) pair filter evaluates AFTER both
    broadcast joins as a residual — never a nested loop (the equi-keys
    are the supp/cust keys, the disjunction only touches the two
    broadcast nation names). The reference needed a 4-job join cascade
    (lineitem><supplier, ><orders, ><customer, then nation lookups from
    DistributedCache side files, core/filecache/DistributedCache.java).

    Determinism: integer-cent revenue, integer year; the 4-row result
    orders on its full unique group key."""
    pair = ["NATION_1", "NATION_2"]
    nat = T(spark, sf, "nation").where(F.col("n_name").isin(pair))
    supp = T(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    cust = T(spark, sf, "customer").select("c_custkey", "c_nationkey")
    orders = T(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = (
        T(spark, sf, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            F.year("l_shipdate").cast("long").alias("l_year"),
            _rev_cents("l_extendedprice", "l_discount").alias("_rc"),
        )
    )
    n1 = nat.select(
        F.col("n_nationkey").alias("_n1k"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("_n2k"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_n1k"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_n2k"))
        .where(
            (
                (F.col("supp_nation") == pair[0])
                & (F.col("cust_nation") == pair[1])
            )
            | (
                (F.col("supp_nation") == pair[1])
                & (F.col("cust_nation") == pair[0])
            )
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("_rc").cast("long").alias("revenue_cents"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

QUERIES["q_agg_tpch_q7"] = QueryDef(
    _tpch_q7,
    _Q7_SQL,
    "TPC-H Q7 shape: two-nation bidirectional volume by year — "
    "symmetric pair disjunction as a residual over two broadcast "
    "nation joins, SF-linear supplier/customer unhinted",
)


# --- Q8: national market share within a region (grouped conditional ratio) ---
def _tpch_q8(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's PROMO-part
    market by order year — the grouped conditional-aggregate ratio
    (Q14's ppm discipline, but per-group and with a 6-table join tree).
    Customer restricts to the AMERICA region (nation><region constant
    broadcast); the share numerator keys on the SUPPLIER's nation via a
    CASE, so one aggregate computes both sums in a single pass (no
    second join pass over the fact). Share = ppm via DECIMAL(38,0)
    integer division (float dies past 2^53 cents).

    Scale: part(PROMO) prunes the fact first (SF-linear, unhinted);
    nation/region constants broadcast; one shuffle per join key plus
    the final tiny year groupBy."""
    part = (
        T(spark, sf, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    )
    li = T(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        _rev_cents("l_extendedprice", "l_discount").alias("_rc"),
    )
    orders = T(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    cust = T(spark, sf, "customer").select("c_custkey", "c_nationkey")
    # ONE enriched 25-row nation dim (nation >< region) feeds BOTH the
    # customer-region filter and the supplier-target flag — pinned so
    # the two consumers don't re-derive it (and the plan carries one
    # scan of each constant dim, not two)
    nat = (
        T(spark, sf, "nation")
        .join(
            F.broadcast(T(spark, sf, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name", "r_name")
        .transform(pin)
    )
    am_nat = nat.where(F.col("r_name") == "AMERICA").select(
        F.col("n_nationkey").alias("_cnk")
    )
    supp = T(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    target = nat.where(F.col("n_name") == "NATION_3").select(
        F.col("n_nationkey").alias("_tnk")
    )
    j = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(am_nat), F.col("c_nationkey") == F.col("_cnk"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(target),
            F.col("s_nationkey") == F.col("_tnk"),
            "left_outer",
        )
    )
    agg = j.groupBy("o_year").agg(
        F.sum(F.when(F.col("_tnk").isNotNull(), F.col("_rc")).otherwise(F.lit(0)))
        .cast("long")
        .alias("nation_cents"),
        F.sum("_rc").cast("long").alias("total_cents"),
    )
    return (
        agg.select(
            "o_year",
            "nation_cents",
            "total_cents",
            F.expr(
                "CAST((CAST(nation_cents AS DECIMAL(38,0)) * 1000000)"
                " div total_cents AS BIGINT)"
            ).alias("mkt_share_ppm"),
        )
        .orderBy("o_year")
    )


_Q8_SQL = """
WITH j AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT) AS rc,
         (SELECT n_name FROM nation WHERE n_nationkey = s_nationkey) = 'NATION_3'
           AS is_target
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n2.n_regionkey = r_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
)
SELECT CAST(o_year AS BIGINT) AS o_year,
       CAST(sum(CASE WHEN is_target THEN rc ELSE 0 END) AS BIGINT) AS nation_cents,
       CAST(sum(rc) AS BIGINT) AS total_cents,
       CAST((1000000 * CAST(sum(CASE WHEN is_target THEN rc ELSE 0 END) AS HUGEINT))
            // sum(rc) AS BIGINT) AS mkt_share_ppm
FROM j
GROUP BY o_year
ORDER BY o_year
"""

QUERIES["q_agg_tpch_q8"] = QueryDef(
    _tpch_q8,
    _Q8_SQL,
    "TPC-H Q8 shape: per-year national market share in a region — "
    "grouped conditional-aggregate ratio in one fact pass, ppm via "
    "DECIMAL integer division",
)


# --- Q9: product-type profit by nation and year ------------------------------
def _tpch_q9(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape: profit on 'red' parts per supplier nation per
    order year — the widest join tree in the suite (6 table reads).
    The fixture lacks partsupp, so supply cost derives from lineitem:
    per (partkey, suppkey), the minimum observed unit price
    (cents div qty — BIGINT floor division, exact and identical in
    both engines for positive integers), same surrogate family as Q2.
    Profit per line = revenue cents - qty * unit cost. The surrogate
    is built from the UNFILTERED pair universe (cost exists regardless
    of which sale we price), then the 'red' part filter prunes the
    fact stream before the orders join.

    Scale: the cost table partial-aggs out of lineitem and joins back
    on the same (partkey, suppkey) shuffle key; part is SF-linear ->
    unhinted; nation is a constant broadcast; exactly 6 scans (the
    registry ceiling) with lineitem read twice — fact + cost
    derivation. Determinism: all-integer profit; full group key
    ordering."""
    li = T(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        F.col("l_quantity").cast("long").alias("_q"),
        _rev_cents("l_extendedprice", "l_discount").alias("_rc"),
        F.expr(
            "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
            " div CAST(l_quantity AS BIGINT)"
        ).alias("_unit"),
    )
    cost = li.groupBy(
        F.col("l_partkey").alias("_ck"), F.col("l_suppkey").alias("_cs")
    ).agg(F.min("_unit").alias("_cost_unit"))
    red = (
        T(spark, sf, "part")
        .where(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    supp = T(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nation = T(spark, sf, "nation").select("n_nationkey", "n_name")
    orders = T(spark, sf, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    j = (
        li.join(red, li.l_partkey == red.p_partkey)
        .join(
            cost,
            (li.l_partkey == F.col("_ck")) & (li.l_suppkey == F.col("_cs")),
        )
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    return (
        j.select(
            "n_name",
            "o_year",
            (F.col("_rc") - F.col("_q") * F.col("_cost_unit")).alias("_p"),
        )
        .groupBy("n_name", "o_year")
        .agg(F.sum("_p").cast("long").alias("profit_cents"))
        .orderBy("n_name", F.col("o_year").desc())
    )


_Q9_SQL = """
WITH cost AS (
  SELECT l_partkey AS ck, l_suppkey AS cs,
         min(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             // CAST(l_quantity AS BIGINT)) AS cost_unit
  FROM lineitem GROUP BY 1, 2
)
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)
                - CAST(l_quantity AS BIGINT) * cost_unit) AS BIGINT) AS profit_cents
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN cost ON ck = l_partkey AND cs = l_suppkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE 'red%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""

QUERIES["q_agg_tpch_q9"] = QueryDef(
    _tpch_q9,
    _Q9_SQL,
    "TPC-H Q9 shape: per-nation-per-year profit on a part family — "
    "6-read join tree with a lineitem-derived (partkey,suppkey) min "
    "unit-cost surrogate for partsupp; all-integer profit",
)


# --- Q11: important stock (HAVING vs global scalar) --------------------------
def _tpch_q11(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose stock value at one nation's
    suppliers exceeds a fixed fraction of that nation's TOTAL value —
    the HAVING-against-global-scalar showcase (Q22 compares per-ROW vs
    a scalar; here it's per-GROUP aggregate vs a scalar aggregate of
    the same derived table). Value surrogate (no partsupp): sum of
    sale cents per part over the nation's lines. The per-part value
    table builds once (pin — consumed by both the global sum and the
    output filter); the 1-row total joins back as a keyless broadcast;
    the fraction test value * 2000 > total stays in integers.

    The reference's analog is the two-job scalar-aggregate-then-filter
    chain with the single total riding DistributedCache
    (core/filecache/DistributedCache.java:79-97)."""
    nat = (
        T(spark, sf, "nation")
        .where(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    supp = (
        T(spark, sf, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = T(spark, sf, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("_pc"),
    )
    per_part = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum("_pc").alias("value_cents"))
        .transform(pin)  # consumed twice: global total + threshold probe
    )
    total = per_part.agg(F.sum("value_cents").alias("_tot"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("value_cents") * F.lit(2000) > F.col("_tot"))
        .select("l_partkey", F.col("value_cents").cast("long").alias("value_cents"))
        .orderBy(F.col("value_cents").desc(), "l_partkey")
    )


_Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey, CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey, value_cents
FROM per_part
WHERE value_cents * 2000 > (SELECT sum(value_cents) FROM per_part)
ORDER BY value_cents DESC, l_partkey
"""

QUERIES["q_agg_tpch_q11"] = QueryDef(
    _tpch_q11,
    _Q11_SQL,
    "TPC-H Q11 shape: per-group aggregate vs a global scalar threshold "
    "(HAVING form) — pinned value table + keyless 1-row broadcast, "
    "integer fraction test (oracle keeps the scalar subquery)",
)


# --- Q12: priority class counts by return flag (conditional 2-way count) -----
def _tpch_q12(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape: lines shipped in a year bucketed by a line
    attribute, counting critical-priority vs other orders — the
    join + two-conditional-counts report (the fixture has no
    l_shipmode; l_returnflag plays the mode axis, preserving the
    shape). One fact pass, both counts from CASE aggregates; the
    orders side projects only (key, priority)."""
    li = (
        T(spark, sf, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .select("l_orderkey", "l_returnflag")
    )
    orders = T(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


_Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

QUERIES["q_agg_tpch_q12"] = QueryDef(
    _tpch_q12,
    _Q12_SQL,
    "TPC-H Q12 shape: join + two conditional CASE counts in one fact "
    "pass (l_returnflag as the mode axis — fixture has no shipmode)",
)


# --- Q15: top supplier (argmax against a global aggregate) -------------------
def _tpch_q15(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) whose quarterly revenue equals the
    MAXIMUM quarterly revenue — the argmax-by-re-join showcase (the
    view + correlated max of classic Q15). The per-supplier revenue
    aggregate builds once (pin — it feeds both the 1-row max and the
    equality probe); the max joins back as a keyless broadcast; ties
    all surface (equality, not top-1-by-sort, which would pick one
    arbitrary winner). Integer cents make the equality exact — a float
    revenue computed in two different summation orders could MISS the
    max it itself produced.

    Reference analog: the two-job max-then-filter chain with the
    single max riding DistributedCache (the same pattern as Q11's
    total)."""
    li = (
        T(spark, sf, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .select("l_suppkey", _rev_cents("l_extendedprice", "l_discount").alias("_rc"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum("_rc").cast("long").alias("total_revenue_cents"))
        .transform(pin)  # consumed twice: global max + equality probe
    )
    mx = rev.agg(F.max("total_revenue_cents").alias("_mx"))
    supp = T(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_revenue_cents") == F.col("_mx"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue_cents")
        .orderBy("s_suppkey")
    )


_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
           AS total_revenue_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue_cents
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_revenue_cents = (SELECT max(total_revenue_cents) FROM rev)
ORDER BY s_suppkey
"""

QUERIES["q_agg_tpch_q15"] = QueryDef(
    _tpch_q15,
    _Q15_SQL,
    "TPC-H Q15 shape: argmax by equality re-join against a pinned "
    "revenue view's 1-row max (ties surface; integer cents make the "
    "equality exact) — oracle keeps the correlated max",
)


# --- Q20: nested-IN semi-join chain with an aggregate threshold --------------
def _tpch_q20(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who concentrated shipments of a part
    family into one year — the nested-IN chain (supplier IN (... WHERE
    part IN (...) GROUP BY ... HAVING agg threshold)). The fixture has
    no partsupp availqty, so the inner threshold adapts to: for some
    'red' part this supplier ships, the 1996 quantity exceeds half the
    pair's all-time quantity (2*q96 > qtotal — integers, no division;
    the classic availqty > 0.5*sum(qty) is the same comparison class).
    Both INs decorrelate to semi-joins: parts semi-restrict the pair
    aggregate's input; qualifying (part, supp) pairs reduce to DISTINCT
    suppliers (the semi join makes DISTINCT free); supplier semi-joins
    the qualifier set.

    Scale: one partial-aggable groupBy on (partkey, suppkey); part is
    SF-linear -> unhinted semi; conditional year sum rides the same
    aggregate (no second pass)."""
    red = (
        T(spark, sf, "part")
        .where(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = T(spark, sf, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.col("l_quantity").cast("long").alias("_q"),
        (F.year("l_shipdate") == 1996).alias("_y96"),
    )
    pairs = (
        li.join(red, li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum("_q").alias("_qt"),
            F.sum(F.when(F.col("_y96"), F.col("_q")).otherwise(0)).alias("_q96"),
        )
        .where(F.lit(2) * F.col("_q96") > F.col("_qt"))
        .select("l_suppkey")
    )
    supp = T(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        supp.join(pairs, supp.s_suppkey == pairs.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


_Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
  GROUP BY l_partkey, l_suppkey
  HAVING 2 * sum(CASE WHEN year(l_shipdate) = 1996
                      THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
           > sum(CAST(l_quantity AS BIGINT))
)
ORDER BY s_name
"""

QUERIES["q_agg_tpch_q20"] = QueryDef(
    _tpch_q20,
    _Q20_SQL,
    "TPC-H Q20 shape: nested-IN chain decorrelated to semi-joins "
    "around one (part,supp) aggregate with an integer half-share "
    "threshold (oracle keeps both INs + HAVING)",
)

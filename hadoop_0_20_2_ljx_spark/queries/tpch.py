"""Declared queries: TPC-H Q2/Q3/Q4/Q5/Q6/Q10/Q14/Q16/Q18/Q19 shapes over the star schema.

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
    items = (
        T(spark, sf, "lineitem")
        .select("l_orderkey", (F.col("l_partkey") % 1000).alias("p"))
        .distinct()
    )
    a = items.select(F.col("l_orderkey").alias("o"), F.col("p").alias("pa"))
    b = items.select(F.col("l_orderkey").alias("o"), F.col("p").alias("pb"))
    pairs = a.join(b, "o").where(F.col("pa") < F.col("pb"))
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

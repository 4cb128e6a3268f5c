"""Declared queries: joins and set operations (Q-join-1..6, Q-set-1..3,
SURVEY.md §2.6/2.7).

The composite-join language (inner/outer/override over co-sorted inputs,
mapred/join/CompositeInputFormat.java:48) maps to Catalyst join selection;
the DistributedCache pattern maps to broadcast(). Catalyst + AQE pick
SMJ/BHJ and handle skew — the strategy decisions the reference forced
users to hand-encode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_0_20_2_ljx_spark.operators import joins, setops
from hadoop_0_20_2_ljx_spark.queries.base import QueryDef, T


# --- Q-join-1: inner composite join ------------------------------------------
def _join_inner(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer").withColumnRenamed("c_custkey", "o_custkey")
    j = joins.inner_join(o, c, on=["o_custkey"])
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )


# --- Q-join-2: full outer composite join -------------------------------------
def _join_full_outer(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer").select("c_custkey", F.col("c_nationkey").alias("nk"))
    s = T(spark, sf, "supplier").select("s_suppkey", F.col("s_nationkey").alias("nk"))
    j = joins.full_outer_join(c, s, on=["nk"])
    return j.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("c_custkey").isNull(), 1)).alias("n_left_null"),
        F.count(F.when(F.col("s_suppkey").isNull(), 1)).alias("n_right_null"),
    )


# --- Q-join-3: override (rightmost-priority) join ----------------------------
def _join_override(spark: SparkSession, sf: str) -> DataFrame:
    """THREE keyed single-valued projections of part; per key the value
    comes from the RIGHTMOST source holding it, full-outer emission, no
    cross product (OverrideRecordReader.java:36-49 — the n-ary
    `override(a,b,c)` composite expression, CompositeInputFormat.java:35).
    The coalesce chain stays BHJ/SMJ-only (no NestedLoop), pinned in
    tests/test_operators.py."""
    p = T(spark, sf, "part")
    a = p.filter(F.col("p_partkey") % 3 != 0).select(
        F.col("p_partkey").alias("k"), F.col("p_name").alias("v")
    )
    b = p.filter(F.col("p_partkey") % 2 == 0).select(
        F.col("p_partkey").alias("k"), F.col("p_brand").alias("v")
    )
    c = p.filter(F.col("p_partkey") % 5 == 0).select(
        F.col("p_partkey").alias("k"), F.col("p_type").alias("v")
    )
    return joins.override_join([a, b, c], key="k", value="v")


# --- Q-join-4: 3-way reduce-side join ----------------------------------------
def _join_3way(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    o = T(spark, sf, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    c = T(spark, sf, "customer").withColumnRenamed("c_custkey", "o_custkey")
    j = li.join(o, on="l_orderkey").join(c, on="o_custkey")
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
    )


# --- Q-join-5: broadcast (DistributedCache) join -----------------------------
def _join_broadcast(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    s = T(spark, sf, "supplier").withColumnRenamed("s_suppkey", "l_suppkey")
    n = T(spark, sf, "nation").withColumnRenamed("n_nationkey", "s_nationkey")
    j = joins.broadcast_join(
        joins.broadcast_join(li, s.select("l_suppkey", "s_nationkey"), on=["l_suppkey"]),
        n.select("s_nationkey", "n_name"),
        on=["s_nationkey"],
    )
    return j.groupBy("n_name").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
    )


# --- Q-join-6 (extra): semi + anti -------------------------------------------
def _join_semi_anti(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey"))
    semi = joins.semi_join(c, o, on=["c_custkey"]).agg(
        F.lit("with_orders").alias("side"), F.count("*").alias("n")
    )
    anti = joins.anti_join(c, o, on=["c_custkey"]).agg(
        F.lit("without_orders").alias("side"), F.count("*").alias("n")
    )
    return semi.unionByName(anti)


# --- Q-join-7 (extra): salted skew join --------------------------------------
def _join_salted(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-safe join rewrite: salt the fact side, replicate the dim side
    across salt buckets. Must be row-identical to the plain join, which is
    exactly what the oracle asserts."""
    from hadoop_0_20_2_ljx_spark.operators.skew import salted_join

    li = T(spark, sf, "lineitem").withColumnRenamed("l_orderkey", "okey")
    o = T(spark, sf, "orders").withColumnRenamed("o_orderkey", "okey")
    j = salted_join(li, o.select("okey", "o_orderpriority", "o_totalprice"), "okey", buckets=8)
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
    )


# --- Q-join-8 (extra): bloom-prefiltered join --------------------------------
def _join_bloom(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom semi-join reduction (BloomMapFile pattern, io/BloomMapFile.java):
    prefilter the fact side through a bloom of the dim keys, then join.
    False positives are eliminated by the join, so the result is exactly
    the plain join — which the oracle asserts.

    The dim side is PINNED (r13): the bloom pattern consumes it three
    times — sizing count, bitmap build, and the exact join — and
    un-pinned each consumer re-scans the source (3 full dim scans at
    100 TB; the scan-once-consume-N pin idiom, same as bm25's corpus
    stats). Measured −16% on the bench row even at sf0.1 scan sizes."""
    from hadoop_0_20_2_ljx_spark.functions.bloom import bloom_prefilter
    from hadoop_0_20_2_ljx_spark.pinning import pin

    li = T(spark, sf, "lineitem").withColumn("k", F.col("l_orderkey"))
    o = pin(
        T(spark, sf, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("k"), "o_totalprice")
    )
    j = bloom_prefilter(li, o, "k", fpp=0.01).join(o, "k")
    return j.agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
    )


# --- Q-set-1: bag union ------------------------------------------------------
def _set_union(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    u = setops.bag_union(
        o.filter(F.col("o_orderkey") % 2 == 0), o.filter(F.col("o_orderkey") % 3 == 0)
    )
    return u.agg(F.count("*").alias("n"), F.sum(F.col("o_orderkey") % 1000003).alias("key_sum"))


# --- Q-set-2: dedup ----------------------------------------------------------
def _set_distinct(spark: SparkSession, sf: str) -> DataFrame:
    d = setops.dedup(T(spark, sf, "lineitem").select("l_partkey", "l_suppkey"))
    return d.agg(F.count("*").alias("n"))


# --- Q-set-3 (extra): intersect / except -------------------------------------
def _set_intersect_except(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer").select((F.col("c_custkey") % 97).alias("k"))
    o = T(spark, sf, "orders").select((F.col("o_custkey") % 97).alias("k"))
    inter = setops.intersect_all_keys(c, o).agg(
        F.lit("intersect").alias("op"), F.count("*").alias("n")
    )
    exc = setops.except_keys(c, o).agg(F.lit("except").alias("op"), F.count("*").alias("n"))
    return inter.unionByName(exc)


QUERIES: dict[str, QueryDef] = {
    "q_join_inner": QueryDef(
        _join_inner,
        "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice),2) AS revenue "
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1",
        "Q-join-1 inner composite join (mapred/join/InnerJoinRecordReader.java:30)",
    ),
    "q_join_full_outer": QueryDef(
        _join_full_outer,
        "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(count(*) FILTER (c_custkey IS NULL) AS BIGINT) AS n_left_null, "
        "CAST(count(*) FILTER (s_suppkey IS NULL) AS BIGINT) AS n_right_null FROM ("
        "SELECT c_custkey, s_suppkey FROM customer FULL OUTER JOIN supplier "
        "ON c_nationkey = s_nationkey)",
        "Q-join-2 full outer composite join (mapred/join/OuterJoinRecordReader.java:30)",
    ),
    "q_join_override": QueryDef(
        _join_override,
        "SELECT coalesce(c.k, a.k, b.k) AS k, coalesce(c.v, b.v, a.v) AS v FROM "
        "(SELECT p_partkey AS k, p_name AS v FROM part WHERE p_partkey % 3 <> 0) a "
        "FULL OUTER JOIN "
        "(SELECT p_partkey AS k, p_brand AS v FROM part WHERE p_partkey % 2 = 0) b "
        "ON a.k = b.k "
        "FULL OUTER JOIN "
        "(SELECT p_partkey AS k, p_type AS v FROM part WHERE p_partkey % 5 = 0) c "
        "ON coalesce(a.k, b.k) = c.k",
        "Q-join-3 n-ary override join, rightmost wins "
        "(mapred/join/OverrideRecordReader.java:36-49; "
        "CompositeInputFormat.java:35 override(a,b,c))",
    ),
    "q_join_3way": QueryDef(
        _join_3way,
        "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n, "
        "round(sum(l_extendedprice*(1-l_discount)),2) AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey GROUP BY 1",
        "Q-join-4 3-way reduce-side join (examples/.../Join.java:74-145)",
    ),
    "q_join_broadcast": QueryDef(
        _join_broadcast,
        "SELECT n_name, CAST(count(*) AS BIGINT) AS n, "
        "round(sum(l_extendedprice*(1-l_discount)),2) AS revenue "
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey GROUP BY 1",
        "Q-join-5 DistributedCache broadcast hash join (core/filecache/DistributedCache.java:79)",
    ),
    "q_join_semi_anti": QueryDef(
        _join_semi_anti,
        "SELECT 'with_orders' AS side, CAST(count(*) AS BIGINT) AS n FROM customer "
        "WHERE c_custkey IN (SELECT o_custkey FROM orders) "
        "UNION ALL SELECT 'without_orders', CAST(count(*) AS BIGINT) FROM customer "
        "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)",
        "Q-join-6 (engine extra) semi/anti join — only hand patterns in the reference",
    ),
    "q_join_salted": QueryDef(
        _join_salted,
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n, "
        "round(sum(l_extendedprice*(1-l_discount)),2) AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1",
        "Q-join-7 (engine extra) salted skew-join rewrite — result-identical "
        "to the plain join (the reference's skew story was speculative "
        "re-execution only, mapred/TaskInProgress.java:866-874)",
    ),
    "q_join_bloom": QueryDef(
        _join_bloom,
        "SELECT CAST(count(*) AS BIGINT) AS n, "
        "round(sum(l_extendedprice*(1-l_discount)),2) AS revenue "
        "FROM lineitem JOIN (SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_orderpriority = '1-URGENT') o ON l_orderkey = o_orderkey",
        "Q-join-8 (engine extra) bloom semi-join reduction "
        "(io/BloomMapFile.java, util/bloom/BloomFilter.java)",
    ),
    "q_set_union": QueryDef(
        _set_union,
        "SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(o_orderkey % 1000003) AS BIGINT) AS key_sum "
        "FROM (SELECT * FROM orders WHERE o_orderkey % 2 = 0 "
        "UNION ALL SELECT * FROM orders WHERE o_orderkey % 3 = 0)",
        "Q-set-1 multi-path bag union (mapred/FileInputFormat.java:282-327)",
    ),
    "q_set_distinct": QueryDef(
        _set_distinct,
        "SELECT CAST(count(*) AS BIGINT) AS n FROM "
        "(SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)",
        "Q-set-2 dedup via distinct (mapred/lib/aggregate/UniqValueCount.java:30)",
    ),
    "q_set_intersect_except": QueryDef(
        _set_intersect_except,
        "SELECT 'intersect' AS op, CAST(count(*) AS BIGINT) AS n FROM ("
        "SELECT c_custkey % 97 AS k FROM customer INTERSECT SELECT o_custkey % 97 FROM orders) "
        "UNION ALL SELECT 'except', CAST(count(*) AS BIGINT) FROM ("
        "SELECT c_custkey % 97 AS k FROM customer EXCEPT SELECT o_custkey % 97 FROM orders)",
        "Q-set-3 (engine extra) intersect/except — absent as primitives in the reference",
    ),
}

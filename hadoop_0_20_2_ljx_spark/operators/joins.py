"""Join operators.

Reference counterparts (SURVEY.md §2.6) — the mapred.join composite-join
language over co-sorted inputs, plus the two manual join patterns:
  - inner(tbl, tbl)    (mapred/join/InnerJoinRecordReader.java:30)
  - outer(tbl, tbl)    (mapred/join/OuterJoinRecordReader.java:30)
  - override(a, b)     (mapred/join/OverrideRecordReader.java:36-49)
  - reduce-side join   (examples/.../Join.java:74-145)
  - map-side hash join via DistributedCache (core/filecache/DistributedCache.java:79)

Catalyst picks SortMergeJoin (the composite join's strategy) or
BroadcastHashJoin (the DistributedCache pattern) automatically; broadcast()
is the explicit hint for when statistics lie. AQE converts to broadcast at
runtime when a side turns out small, and splits skewed partitions.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def inner_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """InnerJoinRecordReader: emit only when ALL sources have the key."""
    return left.join(right, on=on, how="inner")


def full_outer_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """OuterJoinRecordReader: emit when ANY source has the key, with
    positional nulls for absent sides."""
    return left.join(right, on=on, how="full_outer")


def override_join(sources: list[DataFrame], key: str, value: str) -> DataFrame:
    """OverrideRecordReader (:49): per key, emit the value from the
    RIGHTMOST source that has it — priority override, no cross product.

    Precondition (as in the reference, CompositeInputFormat.java:35-37):
    each source has at most one row per key. Implementation: chained
    full_outer + coalesce(rightmost, ..., leftmost). N-1 joins on the same
    key column — Catalyst plans one shuffle per side but reuses the key
    partitioning across the chain.
    """
    def step(acc: DataFrame, nxt_idx: tuple[int, DataFrame]) -> DataFrame:
        i, nxt = nxt_idx
        r = nxt.select(F.col(key), F.col(value).alias(f"_v{i}"))
        joined = acc.join(r, on=key, how="full_outer")
        # rightmost wins
        return joined.withColumn("_v", F.coalesce(F.col(f"_v{i}"), F.col("_v"))).drop(f"_v{i}")

    first = sources[0].select(F.col(key), F.col(value).alias("_v"))
    out = reduce(step, enumerate(sources[1:], start=1), first)
    return out.select(F.col(key), F.col("_v").alias(value))


def broadcast_join(big: DataFrame, small: DataFrame, on: list[str], how: str = "inner") -> DataFrame:
    """The DistributedCache map-side hash join: ship the small table to
    every task, no shuffle of the big side. broadcast() is the explicit
    form; at 100 TB this is the difference between a full lineitem shuffle
    and none."""
    return big.join(broadcast(small), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """left_semi — EXISTS. Absent as a primitive in the reference (only a
    hand-written reduce pattern); first-class here."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """left_anti — NOT EXISTS."""
    return left.join(right, on=on, how="left_anti")

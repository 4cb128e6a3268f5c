"""Set / dedup / sampling operators.

Reference counterparts (SURVEY.md §2.7): union = multi-path input
(mapred/FileInputFormat.java:282-327); dedup = reduce emitting each key
once (mapred/lib/aggregate/UniqValueCount.java:30); sampling = the
scan-time filters (mapred/SequenceFileInputFilter.java:146,195) and
InputSampler (mapred/lib/InputSampler.java:89-418). intersect/except are
engine extras (only hand patterns in the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def bag_union(*dfs: DataFrame) -> DataFrame:
    """Multi-path input: bag (ALL) union — duplicates preserved."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def dedup(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """distinct / dropDuplicates — a shuffle on the dedup key with
    map-side partial dedup (Catalyst plans partial+final HashAggregate,
    the combiner pattern)."""
    return df.dropDuplicates(subset) if subset else df.distinct()


def intersect_all_keys(a: DataFrame, b: DataFrame) -> DataFrame:
    """INTERSECT (set semantics)."""
    return a.intersect(b)


def except_keys(a: DataFrame, b: DataFrame) -> DataFrame:
    """EXCEPT (set semantics)."""
    return a.subtract(b)


def deterministic_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """InputSampler.RandomSampler-style seeded sampling — reproducible
    given identical partitioning (Spark's sample is per-partition
    Bernoulli with a seed)."""
    return df.sample(fraction=fraction, seed=seed)

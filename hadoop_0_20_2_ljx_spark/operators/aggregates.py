"""Aggregation library.

Reference counterparts (SURVEY.md §2.5) — the engine primitive is
reduce(key, iterator<values>) (mapred/Reducer.java:166) plus the map-side
combiner (JobConf.setCombinerClass:879, run at spill MapTask.java:1298).
Spark's HashAggregate does partial (combiner) + final aggregation
automatically, so every helper here is a plain groupBy().agg() whose
physical plan already contains the map-side combine the reference made
users opt into.

  - LongSumReducer / IntSumReducer     (mapred/lib/LongSumReducer.java:36)
  - LongValueSum/Max/Min, DoubleValueSum, StringValueMax/Min
                                       (mapred/lib/aggregate/*.java)
  - UniqValueCount                     (mapred/lib/aggregate/UniqValueCount.java:30)
  - ValueHistogram                     (mapred/lib/aggregate/ValueHistogram.java:33-168)
  - ValueAggregatorJob descriptors     (mapred/lib/aggregate/ValueAggregatorJob.java:110)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sum_by_key(df: DataFrame, key: str | list[str], value: str, alias: str = "sum_value") -> DataFrame:
    """LongSumReducer: sum(value) per key — with automatic partial agg."""
    keys = [key] if isinstance(key, str) else list(key)
    return df.groupBy(*keys).agg(F.sum(value).alias(alias))


def word_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The canonical WordCount (examples/.../WordCount.java:61 uses a
    combiner; Spark's partial HashAggregate is that combiner, for free)."""
    return (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .count()
        .withColumnRenamed("count", "cnt")
    )


def uniq_value_count(
    df: DataFrame, key: str | list[str], value: str, approx: bool = False, alias: str = "uniq_cnt"
) -> DataFrame:
    """UniqValueCount (:30): distinct values per key. The reference caps
    the in-memory set with maxNumItems (:36) — i.e. degrades to an
    approximation under pressure. approx=True is the honest Spark analog
    (HyperLogLog++, bounded memory at any scale); approx=False is exact."""
    keys = [key] if isinstance(key, str) else list(key)
    agg = (
        F.approx_count_distinct(value).alias(alias)
        if approx
        else F.countDistinct(value).alias(alias)
    )
    return df.groupBy(*keys).agg(agg)


def value_histogram(df: DataFrame, key: Column | str, item: Column | str) -> DataFrame:
    """ValueHistogram (:33-168): per key, the frequency distribution of
    items, reported as count / unique / min / max / median / avg / stddev
    of the per-item frequencies.

    Reference semantics notes (getReport :78, details :134):
      - 'median' is the middle element (index n/2) of the sorted frequency
        list, NOT an interpolated percentile — reproduced exactly via
        element_at(sort_array(...), n/2 + 1).
      - stddev is population stddev over frequencies.

    Two-level aggregation: (key,item) counts, then per-key stats — both
    levels get map-side partial aggregation; no value list is ever
    materialized per key (same streaming property as the reference's
    ReduceValuesIterator).
    """
    kc = F.col(key) if isinstance(key, str) else key
    ic = F.col(item) if isinstance(item, str) else item
    freqs = df.groupBy(kc.alias("hkey"), ic.alias("hitem")).agg(F.count("*").alias("freq"))
    return freqs.groupBy("hkey").agg(
        F.sum("freq").alias("n_items"),
        F.count("*").alias("n_unique"),
        F.min("freq").alias("min_freq"),
        F.max("freq").alias("max_freq"),
        F.element_at(
            F.sort_array(F.collect_list("freq")),
            (F.floor(F.count("*") / 2) + 1).cast("int"),
        ).alias("median_freq"),
        F.round(F.avg("freq"), 6).alias("avg_freq"),
        F.round(F.coalesce(F.stddev_pop("freq"), F.lit(0.0)), 6).alias("stddev_freq"),
    )


def multi_aggregate(df: DataFrame, key: str, exprs: dict[str, Column]) -> DataFrame:
    """ValueAggregatorJob: the descriptor-driven 'many aggregates in one
    pass' framework (~900 LoC in the reference) is a single groupBy().agg()
    with N expressions in Spark — one shuffle, all partials combined."""
    return df.groupBy(key).agg(*[c.alias(name) for name, c in exprs.items()])

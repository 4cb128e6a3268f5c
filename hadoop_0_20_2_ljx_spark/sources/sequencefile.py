"""SequenceFile compat: read/write the reference's native K/V container.

Reference: io/SequenceFile.java:186 (Writer :779, Reader :1353) — flat
binary key/value files whose header records the key/value class names
(io/SequenceFile.java:1462-1481). Spark ships the Hadoop I/O layer, so
``sc.sequenceFile`` / ``saveAsSequenceFile`` give genuine wire-format
compatibility: files written here are readable by the reference engine
and vice versa (primitive Writables: Text, IntWritable, LongWritable,
DoubleWritable, BytesWritable auto-convert).

This is deliberately the ONLY place the engine drops to the RDD layer —
the format is row-oriented K/V, there is no columnar projection to push
down, and the conversion cost is the price of wire compat. The idiomatic
container for everything else is Parquet (SURVEY.md §1.5); a typical
migration reads SequenceFiles once and rewrites Parquet.

Scale: both directions stream per-partition (no driver materialization);
read parallelism follows HDFS splits exactly as the reference's
SequenceFileInputFormat (mapred/SequenceFileInputFormat.java:36).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_sequence_file(df: DataFrame, path: str, key_col: str, value_col: str) -> None:
    """Write a two-column DataFrame as a Hadoop SequenceFile.

    Key/value Spark types map to the corresponding Writables (str -> Text,
    int -> LongWritable, float -> DoubleWritable, bytes -> BytesWritable).
    """
    df.select(key_col, value_col).rdd.map(tuple).saveAsSequenceFile(path)


def read_sequence_file(
    spark: SparkSession,
    path: str,
    key_name: str = "key",
    value_name: str = "value",
    min_partitions: int | None = None,
) -> DataFrame:
    """Read a Hadoop SequenceFile into a two-column DataFrame.

    Key/value classes come from the file header, as in the reference's
    reader (io/SequenceFile.java:1462-1481) — no schema needs declaring.
    """
    rdd = spark.sparkContext.sequenceFile(path, minSplits=min_partitions)
    return rdd.toDF([key_name, value_name])

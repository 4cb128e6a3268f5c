"""Source connectors: SequenceFile wire-format roundtrip."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from hadoop_0_20_2_ljx_spark import catalog
from hadoop_0_20_2_ljx_spark.sources import read_sequence_file, write_sequence_file
from tests.conftest import SF_SMOKE

TMP = "/root/repo/.tmp/seqfile"


def test_sequence_file_roundtrip_text(spark):
    shutil.rmtree(TMP, ignore_errors=True)
    cust = catalog.load(spark, SF_SMOKE, "customer").select(
        F.col("c_name").cast("string"), F.col("c_mktsegment").cast("string")
    )
    write_sequence_file(cust, TMP, "c_name", "c_mktsegment")
    back = read_sequence_file(spark, TMP)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, cust.collect()))
    shutil.rmtree(TMP, ignore_errors=True)


def test_sequence_file_roundtrip_numeric(spark):
    shutil.rmtree(TMP, ignore_errors=True)
    orders = catalog.load(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    write_sequence_file(orders, TMP, "o_orderkey", "o_totalprice")
    back = read_sequence_file(spark, TMP, "o_orderkey", "o_totalprice")
    assert back.schema["o_orderkey"].dataType.typeName() == "long"
    a = sorted(map(tuple, back.collect()))
    b = sorted(map(tuple, orders.collect()))
    assert len(a) == len(b)
    assert all(x[0] == y[0] and abs(x[1] - y[1]) < 1e-9 for x, y in zip(a, b))
    shutil.rmtree(TMP, ignore_errors=True)


def test_map_file_directory_roundtrip(spark):
    """MapFile layout: sorted data SequenceFile in a directory; reading
    the directory == reading its data member (io/MapFile.java:92-98)."""
    from hadoop_0_20_2_ljx_spark.sources.sequencefile import read_map_file, write_map_file

    shutil.rmtree(TMP, ignore_errors=True)
    cust = catalog.load(spark, SF_SMOKE, "customer").select(
        F.col("c_name").cast("string"), F.col("c_mktsegment").cast("string")
    )
    write_map_file(cust, TMP, "c_name", "c_mktsegment")
    back = read_map_file(spark, TMP, "c_name", "c_mktsegment")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, cust.collect()))
    # the MapFile ordering contract: data is globally key-sorted
    keys = [r[0] for r in read_map_file(spark, TMP).collect()]
    assert keys == sorted(keys)
    shutil.rmtree(TMP, ignore_errors=True)


def test_sequence_file_compressed_roundtrip(spark):
    """zlib-compressed SequenceFiles (the reference's DefaultCodec) must
    roundtrip; the header must name the codec class so the reference
    reader would dispatch it identically."""
    import glob

    shutil.rmtree(TMP, ignore_errors=True)
    cust = catalog.load(spark, SF_SMOKE, "customer").select(
        F.col("c_name").cast("string"), F.col("c_mktsegment").cast("string")
    )
    write_sequence_file(cust, TMP, "c_name", "c_mktsegment", codec="default")
    parts = [p for p in glob.glob(f"{TMP}/part-*") if not p.endswith(".crc")]
    header = open(parts[0], "rb").read(4096)
    assert b"org.apache.hadoop.io.compress.DefaultCodec" in header
    back = read_sequence_file(spark, TMP)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, cust.collect()))
    shutil.rmtree(TMP, ignore_errors=True)

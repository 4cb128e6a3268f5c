"""Hadoop Archive (.har) wire-compat tests: index layout, Java-hash
ordering, masterindex point lookup, roundtrip."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hadoop_0_20_2_ljx_spark import catalog
from hadoop_0_20_2_ljx_spark.sources import har
from tests.conftest import SF_SMOKE


def test_java_string_hash_golden():
    # java: "abc".hashCode() == 96354, "".hashCode() == 0,
    # "polygenelubricants".hashCode() == Integer.MIN_VALUE (overflow case)
    assert har.java_string_hash("abc") == 96354
    assert har.java_string_hash("") == 0
    assert har.java_string_hash("polygenelubricants") == -(1 << 31)
    assert har.har_hash("polygenelubricants") == 0  # & 0x7fffffff


def test_har_roundtrip_and_layout(spark, tmp_path):
    docs = (
        catalog.load(spark, SF_SMOKE, "documents")
        .select(F.concat(F.lit("doc-"), F.col("doc_id")).alias("name"), "text")
        .limit(200)
    )
    path = str(tmp_path / "docs.har")
    n = har.write_har(docs.repartition(4), path, "name", "text")
    assert n == 200
    names = set(os.listdir(path))
    assert "_index" in names and "_masterindex" in names
    assert any(f.startswith("part-") for f in names)
    with open(os.path.join(path, "_masterindex")) as f:
        assert f.readline().split(" ")[0] == "1"
    # _index sorted by har_hash — the property the bucket search relies on
    hashes = [
        har.har_hash(line.split(" ")[0])
        for line in open(os.path.join(path, "_index"))
    ]
    assert hashes == sorted(hashes)

    back = har.read_har(spark, path)
    src = {r["name"]: r["text"] for r in docs.collect()}
    got = {r["name"]: r["payload"] for r in back.collect()}
    assert got == src


def test_har_point_lookup(spark, tmp_path):
    df = spark.createDataFrame(
        [("a.txt", "alpha"), ("b.txt", "beta"), ("c.txt", "gamma")],
        "name string, text string",
    )
    path = str(tmp_path / "small.har")
    har.write_har(df.coalesce(1), path, "name", "text")
    assert har.har_lookup(path, "b.txt") == "beta"
    assert har.har_lookup(path, "missing.txt") is None


def test_har_version_guard(spark, tmp_path):
    df = spark.createDataFrame([("a", "x")], "name string, text string")
    path = str(tmp_path / "bad.har")
    har.write_har(df, path, "name", "text")
    mi = os.path.join(path, "_masterindex")
    lines = open(mi).readlines()
    lines[0] = "7 \n"
    open(mi, "w").writelines(lines)
    with pytest.raises(IOError, match="Invalid version"):
        har.read_har(spark, path)

"""Tar-shard training export (extensions/shards.py)."""

from __future__ import annotations

import os
import tarfile

from pyspark.sql import functions as F

from hadoop_0_20_2_ljx_spark import catalog
from hadoop_0_20_2_ljx_spark.extensions import shards
from tests.conftest import SF_SMOKE


def test_roundtrip_and_budget(spark, tmp_path):
    path = str(tmp_path / "shards")
    docs = catalog.load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    n = docs.count()
    manifest = shards.write_tar_shards(
        docs.repartition(4, "doc_id"), path, "doc_id", "text",
        shard_budget_bytes=8 * 1024,
    )
    assert sum(m for _, m, _ in manifest) == n
    # budget respected: every shard with >1 member stays under budget
    for fname, members, payload in manifest:
        if members > 1:
            assert payload <= 8 * 1024
        assert os.path.exists(fname)
    assert len(manifest) > 4  # actually rolled shards within partitions
    back = shards.read_tar_shards(spark, path)
    a = sorted((r["doc_id"], r["text"]) for r in docs.collect())
    b = sorted((r["doc_id"], r["text"]) for r in back.collect())
    assert a == b


def test_reproducible_bytes(spark, tmp_path):
    """Same sorted input -> bit-identical shard files (mtime pinned)."""
    import hashlib

    docs = catalog.load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    sums = []
    for run in ("a", "b"):
        p = str(tmp_path / f"rep_{run}")
        shards.write_tar_shards(
            docs.repartitionByRange(2, "doc_id").sortWithinPartitions("doc_id"),
            p, "doc_id", "text", shard_budget_bytes=16 * 1024,
        )
        digest = hashlib.md5()
        for f in sorted(os.listdir(p)):
            digest.update(open(os.path.join(p, f), "rb").read())
        sums.append(digest.hexdigest())
    assert sums[0] == sums[1]


def test_members_are_plain_tar(spark, tmp_path):
    """Any stock tar reader can stream the shards (the loader contract)."""
    path = str(tmp_path / "plain")
    df = spark.createDataFrame(
        [(1, "hello"), (2, "world")], "doc_id long, text string"
    ).coalesce(1)
    shards.write_tar_shards(df, path, "doc_id", "text")
    [f] = [x for x in os.listdir(path) if x.endswith(".tar")]
    with tarfile.open(os.path.join(path, f)) as tar:
        names = {i.name for i in tar}
        assert names == {"1.txt", "2.txt"}
        assert tar.extractfile("1.txt").read() == b"hello"

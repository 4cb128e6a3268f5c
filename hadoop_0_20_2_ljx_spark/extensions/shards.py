"""Training-shard export: pack curated documents into size-budgeted tar
shards (the WebDataset/tarball layout training loaders stream) and read
them back. Engine extra for the 100 TB curation brief; nearest reference
ancestor is MultipleOutputFormat's file-per-bucket routing
(mapred/lib/MultipleOutputFormat.java:51) — here the bucket is a byte
budget, not a key.

Scale shape: one task per partition writes its own shard sequence
(`part{pid}-{seq}.tar`) and rolls to a new tar whenever the budget
fills — no shuffle, no driver involvement beyond the O(shards) manifest
returned; readers list the directory and decode one tar per task. Shard
sizes are data-driven, so a repartition upstream controls shard count ×
size exactly like reducer count did in the reference. Requires an
executor-shared filesystem, same as every posix-path sink.

Determinism: member order inside a shard follows the partition's row
order; with a sorted/range-partitioned input the full layout is
reproducible run-over-run (no rand(), no timestamps — mtime pinned 0).
"""

from __future__ import annotations

import io
import os
import tarfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as S


def write_tar_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    shard_budget_bytes: int = 4 * 1024 * 1024,
) -> list[tuple[str, int, int]]:
    """Write (id, text) rows as ``<id>.txt`` members of size-budgeted tar
    shards. Returns the manifest [(shard_file, n_members, payload_bytes)]
    — O(shards) rows to the driver, never documents."""
    os.makedirs(path, exist_ok=True)

    def write_part(pid, rows):
        seq = 0
        tar = None
        members = 0
        payload = 0

        def open_next():
            nonlocal tar, seq, members, payload
            name = os.path.join(path, f"part{pid:05d}-{seq:04d}.tar")
            tar = tarfile.open(name, "w")
            return name

        name = None
        for row in rows:
            data = str(row[text_col]).encode("utf-8")
            if tar is None:
                name = open_next()
            elif payload + len(data) > shard_budget_bytes and members > 0:
                tar.close()
                yield (name, members, payload)
                seq += 1
                members = 0
                payload = 0
                name = open_next()
            info = tarfile.TarInfo(name=f"{row[id_col]}.txt")
            info.size = len(data)
            info.mtime = 0  # reproducible archives
            tar.addfile(info, io.BytesIO(data))
            members += 1
            payload += len(data)
        if tar is not None:
            tar.close()
            yield (name, members, payload)

    manifest = (
        df.select(id_col, text_col)
        .rdd.mapPartitionsWithIndex(write_part)
        .collect()
    )
    return [(n, int(m), int(p)) for n, m, p in manifest]


def read_tar_shards(
    spark: SparkSession,
    path: str,
    id_name: str = "doc_id",
    text_name: str = "text",
) -> DataFrame:
    """Read every ``*.tar`` shard back to (id, text) rows — one shard per
    task, driver sees only the file listing."""
    shard_files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".tar")
    )
    if not shard_files:
        raise FileNotFoundError(f"no .tar shards under {path}")

    def decode(fname):
        with tarfile.open(fname, "r") as tar:
            for info in tar:
                payload = tar.extractfile(info).read().decode("utf-8")
                yield (int(info.name.rsplit(".", 1)[0]), payload)

    schema = S.StructType(
        [
            S.StructField(id_name, S.LongType(), False),
            S.StructField(text_name, S.StringType(), False),
        ]
    )
    rdd = spark.sparkContext.parallelize(shard_files, len(shard_files)).flatMap(decode)
    return spark.createDataFrame(rdd, schema)

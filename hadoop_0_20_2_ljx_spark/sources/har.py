"""Hadoop Archive (.har) wire compat: write archives the reference's
HarFileSystem can open, and read/look-up archives it wrote.

Reference format (fs/HarFileSystem.java):
  - ``<name>.har/_masterindex``: line 1 = version ("1",
    HarFileSystem.java:129-146); then one line per bucket
    ``startHash endHash startPos endPos`` — hash range covered by the
    bucket and the BYTE offsets of its line range in ``_index``
    (HarFileSystem.java:386-411).
  - ``<name>.har/_index``: one line per entry
    ``name dir|file partName startIndex length [children...]``
    (HarStatus, HarFileSystem.java:448-476), sorted by
    ``getHarHash(name)`` = Java String.hashCode & 0x7fffffff
    (HarFileSystem.java:361-363) so each master bucket covers a
    contiguous line range.
  - ``part-N``: raw concatenated payload bytes; an entry is the
    [startIndex, startIndex+length) slice of its part file
    (HarFileSystem.java:308-335).

Scale shape: one task per partition streams its rows into its own
``part-<pid>`` file and returns O(files) manifest rows (name, part,
start, length) — never payloads — to the driver, which writes the two
index files (metadata-sized). Reads are slice lookups executed on
executors, one part file per task; the point lookup replays the
masterindex bucket search, reading only the bucket's line range.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as S

HAR_VERSION = 1
_BUCKET = 100  # index entries per masterindex bucket


def java_string_hash(s: str) -> int:
    """Java String.hashCode (the archive's sort key), as a signed 32-bit
    value. getHarHash masks to the non-negative 31-bit range."""
    h = 0
    for ch in s:
        h = (31 * h + ord(ch)) & 0xFFFFFFFF
    return h - (1 << 32) if h >= (1 << 31) else h


def har_hash(name: str) -> int:
    """HarFileSystem.getHarHash (HarFileSystem.java:361-363)."""
    return java_string_hash(name) & 0x7FFFFFFF


def write_har(df: DataFrame, har_path: str, name_col: str, payload_col: str) -> int:
    """Archive (name, payload) rows as ``har_path`` (should end in .har).
    Names are stored as ``/<name>`` in-archive paths under a root dir
    entry. Returns the number of archived files."""
    os.makedirs(har_path, exist_ok=True)

    def write_part(pid, rows):
        part = f"part-{pid}"
        pos = 0
        out = None
        for row in rows:
            data = str(row[payload_col]).encode("utf-8")
            if out is None:
                out = open(os.path.join(har_path, part), "wb")
            out.write(data)
            yield (f"/{row[name_col]}", part, pos, len(data))
            pos += len(data)
        if out is not None:
            out.close()

    manifest = (
        df.select(name_col, payload_col).rdd.mapPartitionsWithIndex(write_part).collect()
    )
    # root dir entry: name "/", children = top-level names (no leading /)
    children = " ".join(name[1:] for name, *_ in manifest)
    entries = [(f"/", "dir", "none", 0, 0, children)] + [
        (name, "file", part, start, length, None)
        for name, part, start, length in manifest
    ]
    entries.sort(key=lambda e: har_hash(e[0]))
    index_lines = []
    for name, kind, part, start, length, extra in entries:
        line = f"{name} {kind} {part} {start} {length}"
        if extra:
            line += f" {extra}"
        index_lines.append(line + "\n")
    # masterindex buckets: contiguous _index line ranges by byte offset
    buckets = []
    pos = 0
    for i in range(0, len(index_lines), _BUCKET):
        chunk = index_lines[i : i + _BUCKET]
        size = sum(len(l.encode("utf-8")) for l in chunk)
        start_hash = har_hash(entries[i][0])
        end_hash = har_hash(entries[min(i + _BUCKET, len(entries)) - 1][0])
        buckets.append(f"{start_hash} {end_hash} {pos} {pos + size}\n")
        pos += size
    with open(os.path.join(har_path, "_index"), "w") as f:
        f.writelines(index_lines)
    with open(os.path.join(har_path, "_masterindex"), "w") as f:
        f.write(f"{HAR_VERSION} \n")
        f.writelines(buckets)
    return len(manifest)


def _parse_index(har_path: str) -> list[tuple[str, str, int, int]]:
    """All file entries from _index: (name, part, start, length)."""
    out = []
    with open(os.path.join(har_path, "_index")) as f:
        for line in f:
            parts = line.rstrip("\n").split(" ")
            if len(parts) >= 5 and parts[1] == "file":
                out.append((parts[0], parts[2], int(parts[3]), int(parts[4])))
    return out


def read_har(
    spark: SparkSession, har_path: str, name_out: str = "name", payload_out: str = "payload"
) -> DataFrame:
    """Read every file entry back to (name, payload) rows. The driver
    parses only the index (metadata); payload slices are read on
    executors, grouped one part file per task."""
    with open(os.path.join(har_path, "_masterindex")) as f:
        version = int(f.readline().split(" ")[0])
    if version != HAR_VERSION:
        raise IOError(f"Invalid version {version} expected {HAR_VERSION}")
    entries = _parse_index(har_path)
    by_part: dict[str, list[tuple[str, int, int]]] = {}
    for name, part, start, length in entries:
        by_part.setdefault(part, []).append((name, start, length))

    def read_part(item):
        part, members = item
        with open(os.path.join(har_path, part), "rb") as f:
            for name, start, length in members:
                f.seek(start)
                yield (name[1:], f.read(length).decode("utf-8"))

    schema = S.StructType(
        [
            S.StructField(name_out, S.StringType(), False),
            S.StructField(payload_out, S.StringType(), False),
        ]
    )
    items = sorted(by_part.items())
    rdd = spark.sparkContext.parallelize(items, max(len(items), 1)).flatMap(read_part)
    return spark.createDataFrame(rdd, schema)


def har_lookup(har_path: str, name: str) -> str | None:
    """Point lookup via the masterindex, replaying fileStatusInIndex
    (HarFileSystem.java:386-447): hash the path, pick the bucket(s)
    covering it, scan ONLY those byte ranges of _index, then slice the
    part file. Returns the payload string or None."""
    target = f"/{name}"
    code = har_hash(target)
    stores = []
    with open(os.path.join(har_path, "_masterindex")) as f:
        f.readline()  # version header
        for line in f:
            parts = line.split(" ")
            start_hash, end_hash = int(parts[0]), int(parts[1])
            if start_hash <= code <= end_hash:
                stores.append((int(parts[2]), int(parts[3])))
    hit = None
    with open(os.path.join(har_path, "_index"), "rb") as f:
        for begin, end in stores:
            f.seek(begin)
            for line in f.read(end - begin).decode("utf-8").splitlines():
                parts = line.split(" ")
                if parts[0] == target:
                    hit = parts
                    break
            if hit:
                break
    if hit is None or hit[1] != "file":
        return None
    with open(os.path.join(har_path, hit[2]), "rb") as f:
        f.seek(int(hit[3]))
        return f.read(int(hit[4])).decode("utf-8")

"""TFile wire compat: read/write the reference's sorted block-compressed
K/V container.

Reference: io/file/tfile/TFile.java:128 (layout), BCFile.java (the block
container underneath), tfile/Utils.java:91,195 (TFile's OWN chunked-VLong
encoding — distinct from WritableUtils), tfile/Chunk.java:253 (negative
length = continuation chunk, non-negative = final chunk).

Wire format, tail-first (BCFile.Reader ctor, BCFile.java:614-640):

    [16B magic] [data blocks...] [meta blocks...] [meta index]
    [int64 BE offsetOfMetaIndex] [int16 BE major, int16 BE minor] [16B magic]

* Meta index (BCFile.java:766-793): vint count, then per block
  string("data:"+name), string(compressionName),
  region(vlong offset, vlong compressedSize, vlong rawSize).
* The data-block index is itself the LAST meta block, named
  "BCFile.index" (BCFile.java:315-323): string(defaultCompression),
  vint n, n regions.
* Meta block "TFile.meta" (always uncompressed, TFile.java:310-318):
  version(2 shorts), vlong recordCount, string comparator
  ("" unsorted | "memcmp" | "jclass:...").
* Meta block "TFile.index" (TFile.java:2257-2275): vint len + blob of
  (vint firstKeyLen, firstKey); then per data block vint len + blob of
  (vint keyLen, lastKeyOfBlock, vlong kvEntriesInBlock)
  (TFileIndexEntry.write, TFile.java:2319-2323; the index key is the
  block's LAST key, finishDataBlock TFile.java:655-658).
* Data block records (KeyRegister/ValueRegister, TFile.java:443-444):
  vint keyLen, key bytes, then the value as chunks: vint n — n >= 0 is a
  final chunk of n bytes, n < 0 a continuation chunk of -n bytes.
* Compression "gz" is DefaultCodec = raw zlib stream (Compression.java:159);
  "none" is identity; "lzo" needs a native codec and is refused honestly.

Scale posture: the reader is index-driven — the driver touches ONLY the
tail + two index blocks (O(blocks) bytes), then ships (offset, size,
entries) block descriptors to executors; each task decodes its own block
from the shared filesystem. Key-range scans prune whole blocks against
the last-key index before anything is scheduled, mirroring
Reader.createScannerByKey (TFile.java:671-679). Like sequencefile.py,
this is a deliberate RDD-boundary module: the format is row-oriented K/V
with no columnar projection to push down, and a typical migration reads
TFiles once and rewrites Parquet.
"""

from __future__ import annotations

import io
import os
import struct
import zlib
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as S

MAGIC = bytes(
    [0xD1, 0x11, 0xD3, 0x68, 0x91, 0xB5, 0xD7, 0xB6,
     0x39, 0xDF, 0x41, 0x40, 0x92, 0xBA, 0xE1, 0x50]
)
API_VERSION = (1, 0)
META_PREFIX = "data:"
DATA_INDEX_BLOCK = "BCFile.index"
TFILE_META_BLOCK = "TFile.meta"
TFILE_INDEX_BLOCK = "TFile.index"


# --- TFile's Utils encoding (tfile/Utils.java:91 writeVLong, :195 readVLong) -


def write_vlong(out: io.BytesIO, n: int) -> None:
    if -32 <= n < 128:
        out.write(struct.pack(">b", n))
        return
    un = ~n if n < 0 else n
    nbytes = un.bit_length() // 8 + 1  # bytes incl. sign bit
    first = n >> ((nbytes - 1) * 8)  # arithmetic shift
    if nbytes <= 2 and -20 <= (first if nbytes == 2 else first >> 8) < 20:
        fb = first if nbytes == 2 else first >> 8
        out.write(struct.pack(">bB", fb - 52, n & 0xFF))
        return
    if nbytes <= 3 and -16 <= (first >> (8 * (3 - nbytes))) < 16:
        fb = first >> (8 * (3 - nbytes))
        out.write(struct.pack(">bH", fb - 88, n & 0xFFFF))
        return
    if nbytes <= 4 and -8 <= (first >> (8 * (4 - nbytes))) < 8:
        fb = first >> (8 * (4 - nbytes))
        out.write(struct.pack(">b", fb - 112))
        out.write((n & 0xFFFFFF).to_bytes(3, "big"))
        return
    k = max(nbytes, 4)
    out.write(struct.pack(">b", k - 129))
    out.write((n & ((1 << (8 * k)) - 1)).to_bytes(k, "big"))


def read_vlong(buf: io.BytesIO) -> int:
    (fb,) = struct.unpack(">b", _must_read(buf, 1))
    if fb >= -32:
        return fb
    if fb >= -72:
        return ((fb + 52) << 8) | _must_read(buf, 1)[0]
    if fb >= -104:
        return ((fb + 88) << 16) | int.from_bytes(_must_read(buf, 2), "big")
    if fb >= -120:
        return ((fb + 112) << 24) | int.from_bytes(_must_read(buf, 3), "big")
    k = fb + 129
    return int.from_bytes(_must_read(buf, k), "big", signed=True)


def _must_read(buf, n: int) -> bytes:
    b = buf.read(n)
    if len(b) != n:
        raise EOFError(f"TFile: wanted {n} bytes, got {len(b)}")
    return b


def write_string(out: io.BytesIO, s: str | None) -> None:
    if s is None:
        write_vlong(out, -1)
        return
    b = s.encode("utf-8")
    write_vlong(out, len(b))
    out.write(b)


def read_string(buf: io.BytesIO) -> str | None:
    n = read_vlong(buf)
    if n == -1:
        return None
    return _must_read(buf, n).decode("utf-8")


# --- compression (Compression.java:75-230) -----------------------------------


def _compress(name: str, raw: bytes) -> bytes:
    if name == "none":
        return raw
    if name == "gz":
        return zlib.compress(raw)  # DefaultCodec: zlib-framed deflate
    raise NotImplementedError(
        f"TFile compression {name!r} needs a native codec (python: zlib only "
        "-> supported: none, gz)"
    )


def _decompress(name: str, comp: bytes, raw_size: int) -> bytes:
    if name == "none":
        data = comp
    elif name == "gz":
        data = zlib.decompress(comp)
    else:
        raise NotImplementedError(
            f"TFile compression {name!r} needs a native codec (supported: none, gz)"
        )
    if len(data) != raw_size:
        raise IOError(f"TFile block: raw size {len(data)} != index {raw_size}")
    return data


# --- container structs -------------------------------------------------------


@dataclass(frozen=True)
class BlockRegion:
    offset: int
    compressed_size: int
    raw_size: int


@dataclass(frozen=True)
class TFileInfo:
    """Everything the driver needs: O(blocks) bytes, no record data."""

    path: str
    compression: str
    comparator: str
    record_count: int
    blocks: list[BlockRegion]
    last_keys: list[bytes]  # per block (TFileIndexEntry key)
    entries: list[int]  # kv count per block
    first_key: bytes | None
    meta_blocks: dict[str, tuple[str, BlockRegion]]  # name -> (codec, region)

    @property
    def sorted(self) -> bool:
        return self.comparator != ""


def _decode_records(block: bytes, n_entries: int) -> list[tuple[bytes, bytes]]:
    """Decode one raw data block (TFile.java:443-444 + Chunk.java:253)."""
    buf = io.BytesIO(block)
    out = []
    for _ in range(n_entries):
        klen = read_vlong(buf)
        key = _must_read(buf, klen)
        chunks = []
        while True:
            n = read_vlong(buf)
            if n < 0:
                chunks.append(_must_read(buf, -n))
            else:
                chunks.append(_must_read(buf, n))
                break
        out.append((key, b"".join(chunks)))
    return out


def read_info(path: str) -> TFileInfo:
    """Parse the BCFile tail + both TFile index blocks (driver-side only)."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        if f.read(len(MAGIC)) != MAGIC:
            raise IOError(f"{path}: not a BCFile (bad header magic)")
        f.seek(size - len(MAGIC) - 4 - 8)
        tail = f.read(8 + 4 + len(MAGIC))
        (meta_off,) = struct.unpack(">q", tail[:8])
        major, minor = struct.unpack(">hh", tail[8:12])
        if tail[12:] != MAGIC:
            raise IOError(f"{path}: not a BCFile (bad footer magic)")
        if major != API_VERSION[0]:
            raise IOError(f"{path}: incompatible BCFile version {major}.{minor}")

        f.seek(meta_off)
        mbuf = io.BytesIO(f.read(size - meta_off))
        meta_blocks: dict[str, tuple[str, BlockRegion]] = {}
        for _ in range(read_vlong(mbuf)):
            full = read_string(mbuf)
            if not full.startswith(META_PREFIX):
                raise IOError(f"{path}: corrupted meta index entry {full!r}")
            codec = read_string(mbuf)
            region = BlockRegion(
                read_vlong(mbuf), read_vlong(mbuf), read_vlong(mbuf)
            )
            meta_blocks[full[len(META_PREFIX):]] = (codec, region)

        def meta(name: str) -> bytes:
            codec, r = meta_blocks[name]
            f.seek(r.offset)
            return _decompress(codec, f.read(r.compressed_size), r.raw_size)

        # data-block index (BCFile.DataIndex, BCFile.java:858-871)
        dbuf = io.BytesIO(meta(DATA_INDEX_BLOCK))
        compression = read_string(dbuf)
        blocks = [
            BlockRegion(read_vlong(dbuf), read_vlong(dbuf), read_vlong(dbuf))
            for _ in range(read_vlong(dbuf))
        ]

        # TFile.meta (TFile.java:2044-2052)
        tbuf = io.BytesIO(meta(TFILE_META_BLOCK))
        tmajor, _tminor = struct.unpack(">hh", _must_read(tbuf, 4))
        if tmajor != API_VERSION[0]:
            raise IOError(f"{path}: incompatible TFile version {tmajor}")
        record_count = read_vlong(tbuf)
        comparator = read_string(tbuf)

        # TFile.index (TFile.java:2130-2158)
        ibuf = io.BytesIO(meta(TFILE_INDEX_BLOCK))
        first_key = None
        last_keys: list[bytes] = []
        entries: list[int] = []
        fk_size = read_vlong(ibuf)
        if fk_size > 0:
            fkb = io.BytesIO(_must_read(ibuf, fk_size))
            first_key = _must_read(fkb, read_vlong(fkb))
            for _ in range(len(blocks)):
                eb = io.BytesIO(_must_read(ibuf, read_vlong(ibuf)))
                last_keys.append(_must_read(eb, read_vlong(eb)))
                entries.append(read_vlong(eb))
    return TFileInfo(
        path=path,
        compression=compression,
        comparator=comparator,
        record_count=record_count,
        blocks=blocks,
        last_keys=last_keys,
        entries=entries,
        first_key=first_key,
        meta_blocks=meta_blocks,
    )


def read_tfile(
    spark: SparkSession,
    path: str,
    key_name: str = "key",
    value_name: str = "value",
    begin_key: bytes | None = None,
    end_key: bytes | None = None,
) -> DataFrame:
    """Scan a TFile into a (binary, binary) DataFrame, one task per data
    block. ``begin_key``/``end_key`` give the reference's key-range
    scanner semantics on a sorted TFile (begin inclusive, end exclusive,
    memcmp order — Reader.createScannerByKey, TFile.java:671): whole
    blocks outside the range are pruned via the last-key index before any
    task is scheduled, then exact bounds are re-applied per record.
    """
    info = read_info(path)
    if (begin_key is not None or end_key is not None) and not info.sorted:
        raise ValueError("key-range scan requires a sorted TFile")
    picked = []
    for i, region in enumerate(info.blocks):
        # block i spans (last_keys[i-1], last_keys[i]] in memcmp order
        if begin_key is not None and info.last_keys[i] < begin_key:
            continue
        if end_key is not None and i > 0 and info.last_keys[i - 1] >= end_key:
            continue
        picked.append(
            (region.offset, region.compressed_size, region.raw_size, info.entries[i])
        )
    compression = info.compression
    fpath = os.path.abspath(path)
    lo, hi = begin_key, end_key

    def decode_block(desc):
        offset, csize, rawsize, n_entries = desc
        with open(fpath, "rb") as f:
            f.seek(offset)
            raw = _decompress(compression, f.read(csize), rawsize)
        for k, v in _decode_records(raw, n_entries):
            if lo is not None and k < lo:
                continue
            if hi is not None and k >= hi:
                continue
            yield (bytearray(k), bytearray(v))

    schema = S.StructType(
        [
            S.StructField(key_name, S.BinaryType(), False),
            S.StructField(value_name, S.BinaryType(), False),
        ]
    )
    if not picked:
        return spark.createDataFrame([], schema)
    rdd = spark.sparkContext.parallelize(picked, len(picked)).flatMap(decode_block)
    return spark.createDataFrame(rdd, schema)


def write_tfile_dir(
    df: DataFrame,
    path: str,
    key_col: str,
    value_col: str,
    compression: str = "none",
) -> int:
    """Distributed TFile export: one sorted TFile per partition, the
    reference's reducer-output layout (each reduce task emits one sorted
    container). Keys/values are cast to their text bytes unless already
    binary. The driver sees only O(partitions) per-file counts; record
    bytes stream executor-side through write_tfile. Requires a filesystem
    all executors share (true for local mode and any NFS/DBFS-style
    cluster mount — the same constraint as any posix-path sink).
    Returns the total record count."""
    os.makedirs(path, exist_ok=True)

    def to_bytes(x) -> bytes:
        if isinstance(x, (bytes, bytearray)):
            return bytes(x)
        return str(x).encode("utf-8")

    sdf = df.select(key_col, value_col).sortWithinPartitions(key_col)

    def write_part(idx, rows):
        part = os.path.join(path, f"part-{idx:05d}.tfile")
        n = write_tfile(
            ((to_bytes(k), to_bytes(v)) for k, v in rows), part, compression
        )
        yield n

    counts = sdf.rdd.mapPartitionsWithIndex(write_part).collect()
    return sum(counts)


def read_tfile_dir(
    spark: SparkSession,
    path: str,
    key_name: str = "key",
    value_name: str = "value",
) -> DataFrame:
    """Read every part-*.tfile of a directory written by write_tfile_dir
    (or a set of reference-written TFiles) as one DataFrame."""
    parts = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".tfile")
    )
    if not parts:
        raise FileNotFoundError(f"no .tfile parts under {path}")
    out = read_tfile(spark, parts[0], key_name, value_name)
    for p in parts[1:]:
        out = out.unionByName(read_tfile(spark, p, key_name, value_name))
    return out


def write_tfile(
    records,
    path: str,
    compression: str = "none",
    comparator: str = "memcmp",
    min_block_size: int = 256 * 1024,
) -> int:
    """Write (key: bytes, value: bytes) pairs as a TFile the reference can
    open. With ``comparator='memcmp'`` keys must arrive sorted (enforced,
    as TFile.Writer does at TFile.java:450-457); pass ``comparator=''``
    for an unsorted file. Returns the record count.

    This is a local/driver-side writer (fixture + interchange path, the
    mirror of read_info's single-file layout); the distributed export
    story remains Parquet/SequenceFile, as for MapFile (sequencefile.py).
    """
    if compression not in ("none", "gz"):
        raise NotImplementedError("write_tfile supports compression none|gz")
    blocks: list[BlockRegion] = []
    last_keys: list[bytes] = []
    entries: list[int] = []
    n_records = 0
    with open(path, "wb") as f:
        f.write(MAGIC)

        def flush_block(buf: io.BytesIO, count: int, last_key: bytes) -> None:
            raw = buf.getvalue()
            comp = _compress(compression, raw)
            blocks.append(BlockRegion(f.tell(), len(comp), len(raw)))
            f.write(comp)
            last_keys.append(last_key)
            entries.append(count)

        cur = io.BytesIO()
        cur_count = 0
        prev_key: bytes | None = None
        first_key: bytes | None = None
        for key, value in records:
            key, value = bytes(key), bytes(value)
            if comparator == "memcmp" and prev_key is not None and key < prev_key:
                raise ValueError("Keys are not added in sorted order")
            if first_key is None:
                first_key = key
            write_vlong(cur, len(key))
            cur.write(key)
            write_vlong(cur, len(value))  # one final chunk (SingleChunkEncoder)
            cur.write(value)
            prev_key = key
            cur_count += 1
            n_records += 1
            if cur.tell() >= min_block_size:
                flush_block(cur, cur_count, key)
                cur, cur_count = io.BytesIO(), 0
        if cur_count:
            flush_block(cur, cur_count, prev_key)

        meta_regions: list[tuple[str, str, BlockRegion]] = []

        def write_meta(name: str, payload: bytes, codec: str) -> None:
            comp = _compress(codec, payload)
            meta_regions.append(
                (name, codec, BlockRegion(f.tell(), len(comp), len(payload)))
            )
            f.write(comp)

        # TFile.meta — always uncompressed (TFile.java:310-312)
        mb = io.BytesIO()
        mb.write(struct.pack(">hh", *API_VERSION))
        write_vlong(mb, n_records)
        write_string(mb, comparator)
        write_meta(TFILE_META_BLOCK, mb.getvalue(), "none")

        # TFile.index — default compression (TFile.java:320-321)
        ib = io.BytesIO()
        if first_key is None:
            write_vlong(ib, 0)
        else:
            fkb = io.BytesIO()
            write_vlong(fkb, len(first_key))
            fkb.write(first_key)
            write_vlong(ib, fkb.tell())
            ib.write(fkb.getvalue())
            for lk, cnt in zip(last_keys, entries):
                eb = io.BytesIO()
                write_vlong(eb, len(lk))
                eb.write(lk)
                write_vlong(eb, cnt)
                write_vlong(ib, eb.tell())
                ib.write(eb.getvalue())
        write_meta(TFILE_INDEX_BLOCK, ib.getvalue(), compression)

        # BCFile.index (data-block index) — last meta block (BCFile.java:315)
        db = io.BytesIO()
        write_string(db, compression)
        write_vlong(db, len(blocks))
        for r in blocks:
            write_vlong(db, r.offset)
            write_vlong(db, r.compressed_size)
            write_vlong(db, r.raw_size)
        write_meta(DATA_INDEX_BLOCK, db.getvalue(), compression)

        # meta index + tail (BCFile.Writer.close, BCFile.java:325-333)
        meta_off = f.tell()
        tb = io.BytesIO()
        write_vlong(tb, len(meta_regions))
        for name, codec, r in meta_regions:
            write_string(tb, META_PREFIX + name)
            write_string(tb, codec)
            write_vlong(tb, r.offset)
            write_vlong(tb, r.compressed_size)
            write_vlong(tb, r.raw_size)
        f.write(tb.getvalue())
        f.write(struct.pack(">q", meta_off))
        f.write(struct.pack(">hh", *API_VERSION))
        f.write(MAGIC)
    return n_records

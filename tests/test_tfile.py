"""TFile container wire-format tests (io/file/tfile/TFile.java:128).

The codec is exercised three ways: the VLong encoding against the spec's
documented byte forms (tfile/Utils.java:56-83), python write -> python
read roundtrips across compressions and block counts, and the key-range
scanner's block-pruning semantics (begin inclusive / end exclusive,
TFile.java:671-679).
"""

from __future__ import annotations

import io

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_0_20_2_ljx_spark.sources import tfile


# --- VLong codec -------------------------------------------------------------


@pytest.mark.parametrize(
    "n,expected",
    [
        (0, b"\x00"),
        (127, b"\x7f"),
        (-32, b"\xe0"),
        # 2-byte: [n/256 - 52, n & 0xff]
        (128, bytes([0 - 52 + 256 & 0xFF, 128])),
        (-33, bytes([(-1 - 52) & 0xFF, (-33) & 0xFF])),
        (5119, bytes([(19 - 52) & 0xFF, 5119 & 0xFF])),
        # 3-byte: [n/2^16 - 88, n>>8, n&0xff]
        (5120, bytes([(0 - 88) & 0xFF, 5120 >> 8, 5120 & 0xFF])),
        # 5-byte marker -125 + int32
        (2**30, bytes([(-125) & 0xFF]) + (2**30).to_bytes(4, "big")),
        # 9-byte marker -121 + int64
        (
            2**62,
            bytes([(-121) & 0xFF]) + (2**62).to_bytes(8, "big"),
        ),
    ],
)
def test_vlong_known_encodings(n, expected):
    out = io.BytesIO()
    tfile.write_vlong(out, n)
    assert out.getvalue() == expected
    assert tfile.read_vlong(io.BytesIO(out.getvalue())) == n


@given(
    st.one_of(
        st.integers(-(2**63), 2**63 - 1),
        st.integers(-70000, 70000),  # dense around the multi-byte boundaries
    )
)
@settings(max_examples=400, deadline=None)
def test_vlong_roundtrip(n):
    out = io.BytesIO()
    tfile.write_vlong(out, n)
    buf = io.BytesIO(out.getvalue())
    assert tfile.read_vlong(buf) == n
    assert buf.read() == b""  # no trailing bytes


def test_string_roundtrip():
    out = io.BytesIO()
    tfile.write_string(out, "héllo")
    tfile.write_string(out, None)
    tfile.write_string(out, "")
    buf = io.BytesIO(out.getvalue())
    assert tfile.read_string(buf) == "héllo"
    assert tfile.read_string(buf) is None
    assert tfile.read_string(buf) == ""


# --- container roundtrip -----------------------------------------------------


def _records(n):
    return [(b"k%06d" % i, b"v-" + (b"x" * (i % 50)) + b"%d" % i) for i in range(n)]


@pytest.mark.parametrize("compression", ["none", "gz"])
def test_roundtrip_multiblock(spark, tmp_path, compression):
    path = str(tmp_path / f"t_{compression}.tfile")
    recs = _records(2000)
    assert tfile.write_tfile(recs, path, compression=compression,
                             min_block_size=4096) == 2000
    info = tfile.read_info(path)
    assert info.record_count == 2000
    assert info.compression == compression
    assert info.comparator == "memcmp" and info.sorted
    assert len(info.blocks) > 5  # really multi-block
    assert sum(info.entries) == 2000
    assert info.first_key == b"k000000"
    assert info.last_keys[-1] == b"k001999"
    got = sorted(
        (bytes(r["key"]), bytes(r["value"]))
        for r in tfile.read_tfile(spark, path).collect()
    )
    assert got == recs


def test_key_range_scan_prunes_blocks(spark, tmp_path):
    path = str(tmp_path / "range.tfile")
    tfile.write_tfile(_records(2000), path, min_block_size=4096)
    df = tfile.read_tfile(
        spark, path, begin_key=b"k000500", end_key=b"k000510"
    )
    # begin inclusive, end exclusive (TFile.java:671-679)
    assert df.rdd.getNumPartitions() <= 2  # pruned to the owning block(s)
    keys = sorted(bytes(r["key"]) for r in df.collect())
    assert keys == [b"k%06d" % i for i in range(500, 510)]


def test_unsorted_writer_and_sort_enforcement(spark, tmp_path):
    path = str(tmp_path / "unsorted.tfile")
    recs = [(b"b", b"2"), (b"a", b"1")]
    with pytest.raises(ValueError, match="sorted order"):
        tfile.write_tfile(recs, str(tmp_path / "bad.tfile"))
    tfile.write_tfile(recs, path, comparator="")
    info = tfile.read_info(path)
    assert not info.sorted
    with pytest.raises(ValueError, match="sorted"):
        tfile.read_tfile(spark, path, begin_key=b"a")
    got = {bytes(r["key"]): bytes(r["value"])
           for r in tfile.read_tfile(spark, path).collect()}
    assert got == {b"a": b"1", b"b": b"2"}


def test_empty_tfile(spark, tmp_path):
    path = str(tmp_path / "empty.tfile")
    assert tfile.write_tfile([], path) == 0
    info = tfile.read_info(path)
    assert info.record_count == 0 and info.blocks == []
    assert tfile.read_tfile(spark, path).count() == 0


def test_value_continuation_chunks(spark, tmp_path):
    """Reader must reassemble multi-chunk values (Chunk.java:253: negative
    vint = continuation). The python writer always emits single chunks, so
    hand-craft a chunked record through the private block codec."""
    buf = io.BytesIO()
    tfile.write_vlong(buf, 1)
    buf.write(b"k")
    tfile.write_vlong(buf, -3)
    buf.write(b"abc")
    tfile.write_vlong(buf, 2)
    buf.write(b"de")
    [(k, v)] = tfile._decode_records(buf.getvalue(), 1)
    assert (k, v) == (b"k", b"abcde")

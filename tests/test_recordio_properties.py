"""Property tests for the rcc binary wire codec (functions/recordio.py):
hypothesis-generated records must roundtrip bit-exactly through
pack_binary/unpack_binary, and the vlong integer form must honor
WritableUtils' length contract (io/WritableUtils.java) for the whole
int64 domain — the golden-bytes test pins known values, these pin the
space between them."""

from __future__ import annotations

import io

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    ByteType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from hadoop_0_20_2_ljx_spark.functions.recordio import (
    _read_wvlong,
    _write_wvlong,
    pack_binary,
    unpack_binary,
)

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=300, deadline=None)
@given(I64)
def test_vlong_roundtrip_full_domain(i):
    out = io.BytesIO()
    _write_wvlong(out, i)
    assert _read_wvlong(io.BytesIO(out.getvalue())) == i


@settings(max_examples=300, deadline=None)
@given(I64)
def test_vlong_length_contract(i):
    """WritableUtils: one byte for [-112, 127]; otherwise 1 + the minimal
    big-endian byte count of |i| (ones'-complemented when negative)."""
    out = io.BytesIO()
    _write_wvlong(out, i)
    n = len(out.getvalue())
    if -112 <= i <= 127:
        assert n == 1
    else:
        mag = ~i if i < 0 else i
        expect = 1 + max(1, (mag.bit_length() + 7) // 8)
        assert n == expect, (i, n, expect)


_REC = StructType(
    [
        StructField("okey", LongType()),
        StructField("flag", BooleanType()),
        StructField("b", ByteType()),
        StructField("name", StringType()),
        StructField("price", DoubleType()),
        StructField("tags", ArrayType(StringType())),
        StructField("counts", MapType(StringType(), LongType())),
        StructField(
            "nested",
            StructType(
                [StructField("xs", ArrayType(LongType())), StructField("s", StringType())]
            ),
        ),
    ]
)

_record = st.fixed_dictionaries(
    {
        "okey": I64,
        "flag": st.booleans(),
        "b": st.integers(min_value=-128, max_value=127),
        "name": st.text(max_size=40),
        "price": st.floats(allow_nan=False, width=64),
        "tags": st.lists(st.text(max_size=10), max_size=5),
        "counts": st.dictionaries(st.text(max_size=8), I64, max_size=5),
        "nested": st.fixed_dictionaries(
            {"xs": st.lists(I64, max_size=6), "s": st.text(max_size=20)}
        ),
    }
)


@settings(max_examples=150, deadline=None)
@given(_record)
def test_binary_record_roundtrip(rec):
    assert unpack_binary(pack_binary(rec, _REC), _REC) == rec


@settings(max_examples=60, deadline=None)
@given(_record, _record)
def test_binary_records_concatenate_without_framing_confusion(r1, r2):
    """Two packed records laid end to end must carve back apart by schema
    alone (the wire form is self-delimiting per field — no record length
    prefix exists to hide a codec error)."""
    blob = pack_binary(r1, _REC) + pack_binary(r2, _REC)
    buf = io.BytesIO(blob)
    from hadoop_0_20_2_ljx_spark.functions.recordio import _bin_read

    assert _bin_read(buf, _REC) == r1
    assert _bin_read(buf, _REC) == r2
    assert not buf.read()

"""Record IDL serialization parity: CSV/JSON/XML struct roundtrips."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_0_20_2_ljx_spark import catalog
from hadoop_0_20_2_ljx_spark.functions import recordio
from tests.conftest import SF_SMOKE

DDL = "o_orderkey bigint, o_orderpriority string, o_totalprice double"


@pytest.fixture()
def records(spark):
    orders = catalog.load(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return orders, recordio.pack(orders, ["o_orderkey", "o_orderpriority", "o_totalprice"])


def _assert_same(orders, unpacked):
    a = sorted(map(tuple, orders.collect()))
    b = sorted(map(tuple, unpacked.collect()))
    assert len(a) == len(b)
    assert all(
        x[0] == y[0] and x[1] == y[1] and abs(x[2] - y[2]) < 1e-9 for x, y in zip(a, b)
    )


def test_csv_roundtrip(spark, records):
    orders, packed = records
    back = recordio.unpack(recordio.from_csv_records(recordio.to_csv_records(packed), DDL))
    _assert_same(orders, back)


def test_json_roundtrip(spark, records):
    orders, packed = records
    back = recordio.unpack(recordio.from_json_records(recordio.to_json_records(packed), DDL))
    _assert_same(orders, back)


def test_xml_roundtrip(spark, records):
    orders, packed = records
    back = recordio.unpack(recordio.from_xml_records(recordio.to_xml_records(packed), DDL))
    _assert_same(orders, back)


def test_record_schema_metadata(spark, records):
    _, packed = records
    st = recordio.record_schema(packed)
    assert [f.name for f in st.fields] == ["o_orderkey", "o_orderpriority", "o_totalprice"]


# --- rcc IDL -> StructType compiler ------------------------------------------
NESTED_IDL = """
// a comment
module org.example.links {
  class Location {
    double lat;
    double lon;
  }
}
module org.example {
  class Page {
    ustring url;
    buffer raw;
    org.example.links.Location loc;
    vector<ustring> anchors;
    map<ustring, long> counts;
  }
}
"""


def test_idl_compiles_nested_vector_map():
    from pyspark.sql.types import ArrayType, BinaryType, DoubleType, LongType, MapType, StringType, StructType

    recs = recordio.compile_idl(NESTED_IDL)
    assert set(recs) == {"org.example.links.Location", "org.example.Page"}
    page = recordio.schema_from_idl(NESTED_IDL, "Page")
    byname = {f.name: f.dataType for f in page.fields}
    assert byname["url"] == StringType()
    assert byname["raw"] == BinaryType()
    assert isinstance(byname["loc"], StructType)
    assert byname["loc"]["lat"].dataType == DoubleType()
    assert byname["anchors"] == ArrayType(StringType())
    assert byname["counts"] == MapType(StringType(), LongType())


def test_idl_rejects_bad_source():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        recordio.compile_idl("module m { class A { int x } }")  # missing ';'
    with _pytest.raises(ValueError):
        recordio.compile_idl("module m { class A { unknown_t x; } }")
    with _pytest.raises(NotImplementedError):
        recordio.compile_idl('include "other.jr"')


def test_idl_schema_json_roundtrip(spark):
    """Nested record incl. vector/map survives the JSON wire form."""
    schema = recordio.schema_from_idl(NESTED_IDL, "Page")
    rows = [
        ("u1", bytearray(b"\x01\x02"), (1.5, -2.25), ["a", "b"], {"x": 1, "y": 2}),
        ("u2", bytearray(b""), (0.0, 0.0), [], {}),
    ]
    df = spark.createDataFrame(rows, schema)
    packed = recordio.pack(df, [f.name for f in schema.fields])
    back = recordio.unpack(
        recordio.from_json_records(recordio.to_json_records(packed), recordio.ddl(schema))
    )
    got = sorted(back.collect(), key=lambda r: r["url"])
    assert [r["url"] for r in got] == ["u1", "u2"]
    assert bytes(got[0]["raw"]) == b"\x01\x02"
    assert got[0]["loc"]["lon"] == -2.25
    assert got[0]["anchors"] == ["a", "b"]
    assert got[0]["counts"] == {"x": 1, "y": 2}

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

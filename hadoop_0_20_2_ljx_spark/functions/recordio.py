"""Record I/O: the reference's Record IDL serialization surface.

Reference: the `rcc` IDL (record/compiler/generated/RccConstants.java:25-46)
declares nested record schemas that serialize to **binary, CSV, or XML**
(record/BinaryRecordInput.java, CsvRecordInput.java, XmlRecordInput.java)
with runtime type metadata (record/meta/RecordTypeInfo.java).

Spark mapping: the IDL itself is subsumed by StructType construction; the
three wire formats map to
  - binary -> Parquet / SequenceFile (sources/sequencefile.py) — the
    self-describing container role,
  - CSV    -> to_csv/from_csv over a struct column,
  - XML    -> to_xml/from_xml over a struct column,
plus JSON (absent in 2008; the modern default). All four keep the schema
(`RecordTypeInfo`'s job) as an explicit StructType/DDL string.

Everything here is JVM expression work — serialization happens inside
whole-stage codegen, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def pack(df: DataFrame, cols: list[str], out: str = "record") -> DataFrame:
    """Bundle columns into one struct column (the 'record')."""
    return df.select(F.struct(*[F.col(c) for c in cols]).alias(out))


def record_schema(df: DataFrame, record_col: str = "record") -> StructType:
    """The record's runtime type info (RecordTypeInfo analog)."""
    return df.schema[record_col].dataType  # type: ignore[return-value]


def to_csv_records(df: DataFrame, record_col: str = "record", **options: str) -> DataFrame:
    return df.select(F.to_csv(F.col(record_col), options or None).alias("csv"))


def from_csv_records(
    df: DataFrame, schema_ddl: str, csv_col: str = "csv", **options: str
) -> DataFrame:
    return df.select(F.from_csv(F.col(csv_col), schema_ddl, options or None).alias("record"))


def to_json_records(df: DataFrame, record_col: str = "record") -> DataFrame:
    return df.select(F.to_json(F.col(record_col)).alias("json"))


def from_json_records(df: DataFrame, schema_ddl: str, json_col: str = "json") -> DataFrame:
    return df.select(F.from_json(F.col(json_col), schema_ddl).alias("record"))


def to_xml_records(df: DataFrame, record_col: str = "record", row_tag: str = "record") -> DataFrame:
    return df.select(F.to_xml(F.col(record_col), {"rowTag": row_tag}).alias("xml"))


def from_xml_records(
    df: DataFrame, schema_ddl: str, xml_col: str = "xml", row_tag: str = "record"
) -> DataFrame:
    return df.select(
        F.from_xml(F.col(xml_col), schema_ddl, {"rowTag": row_tag}).alias("record")
    )


def unpack(df: DataFrame, record_col: str = "record") -> DataFrame:
    """Flatten the record back to top-level columns."""
    return df.select(f"{record_col}.*")

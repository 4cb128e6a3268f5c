"""DuckDB-oracle comparison harness.

The systematic version of the reference's DBCountPageView.verify()
pattern (examples/.../DBCountPageView.java:72,239 — run the job, then
recompute with embedded SQL and compare): every declared query runs on
PySpark AND on DuckDB over the same parquet files, compared by
order-insensitive sorted row representation with floats rounded to 1e-9
(FIXTURES.md oracle protocol).
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from hadoop_0_20_2_ljx_spark.catalog import TABLES, table_path


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register every fixture table as a view, like the driver does."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _canon_value(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, (int, bool, str)):
        return v
    return str(v)


def canon_rows(pdf: pd.DataFrame) -> list[tuple]:
    """Columns sorted by name, floats rounded, rows sorted — the driver's
    order-insensitive value-hash input."""
    cols = sorted(pdf.columns)
    rows = [tuple(_canon_value(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return sorted(rows, key=repr)


def compare(
    spark_df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str
) -> tuple[bool, str]:
    """Run both sides, return (match, diagnostic)."""
    s_pdf = spark_df.toPandas()
    d_pdf = con.execute(sql).fetchdf()
    if sorted(s_pdf.columns) != sorted(d_pdf.columns):
        return False, f"columns differ: spark={sorted(s_pdf.columns)} duck={sorted(d_pdf.columns)}"
    if len(s_pdf) != len(d_pdf):
        return False, f"row counts differ: spark={len(s_pdf)} duck={len(d_pdf)}"
    s_rows, d_rows = canon_rows(s_pdf), canon_rows(d_pdf)
    if s_rows != d_rows:
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
        return False, f"values differ; first diffs (spark, duck): {diffs}"
    return True, f"ok ({len(s_rows)} rows)"


def run_query(
    name: str, spark: SparkSession, sf_dir: str
) -> tuple[bool, str]:
    """Run one registered query against its oracle (rows-only when no
    oracle is declared)."""
    from hadoop_0_20_2_ljx_spark.queries import REGISTRY

    qd = REGISTRY[name]
    df = qd.spark(spark, sf_dir)
    if qd.oracle is None:
        n = df.count()
        return True, f"rows-only ({n} rows, no oracle)"
    con = duckdb_connect(sf_dir)
    try:
        return compare(df, con, qd.oracle)
    finally:
        con.close()

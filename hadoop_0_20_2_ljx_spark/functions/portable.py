"""Cross-engine deterministic scalar helpers.

The reference hashes with MD5Hash (io/MD5Hash.java:30) for sampling
filters (mapred/SequenceFileInputFilter.java:195 MD5Filter) and with
hashCode for partitioning (mapred/lib/HashPartitioner.java:35). For our
DuckDB-oracle protocol we need hash functions that evaluate to the SAME
value in Spark SQL and in DuckDB SQL — Spark's `hash()` (murmur3) and
DuckDB's `hash()` differ, so both sides derive integers from md5 hex,
which is bit-identical everywhere.

At scale this stays JVM-side (md5/conv are codegen'd built-ins, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash32(col: Column) -> Column:
    """Deterministic non-negative 32-bit hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def portable_hash64(col: Column) -> Column:
    """Deterministic 63-bit hash of a string column (Spark side).

    Uses 15 hex chars (60 bits) so the value fits a signed BIGINT in both
    engines without overflow-sign games.
    """
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def portable_hash32_sql(expr: str) -> str:
    """DuckDB-side rendering of portable_hash32 for oracle SQL."""
    return f"CAST(('0x' || substring(md5(CAST(({expr}) AS VARCHAR)), 1, 8)) AS BIGINT)"


def portable_hash64_sql(expr: str) -> str:
    """DuckDB-side rendering of portable_hash64 for oracle SQL."""
    return f"CAST(('0x' || substring(md5(CAST(({expr}) AS VARCHAR)), 1, 15)) AS BIGINT)"

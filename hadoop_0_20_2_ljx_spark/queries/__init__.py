"""The declared-query registry: SURVEY.md §2's corpus, each entry a
PySpark implementation + DuckDB oracle (oracle.py runs the comparison).
"""

from __future__ import annotations

from hadoop_0_20_2_ljx_spark.queries.base import QueryDef  # noqa: F401


def _build() -> dict[str, QueryDef]:
    registry: dict[str, QueryDef] = {}
    from hadoop_0_20_2_ljx_spark.queries import agg, core, ext, join_set, sink, udf_misc

    for mod in (core, agg, join_set, sink, udf_misc, ext):
        for k, v in mod.QUERIES.items():
            if k in registry:
                raise ValueError(f"duplicate query name {k}")
            registry[k] = v
    return registry


REGISTRY: dict[str, QueryDef] = _build()

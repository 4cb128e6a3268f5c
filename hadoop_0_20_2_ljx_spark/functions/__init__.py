from hadoop_0_20_2_ljx_spark.functions.portable import (  # noqa: F401
    portable_hash32,
    portable_hash64,
    portable_hash32_sql,
    portable_hash64_sql,
)

"""External-process UDFs: the Hadoop Pipes / Streaming surface.

Reference: C++ pipes runs user executables against a binary socket
protocol (mapred/pipes/Application.java runClient:177, Submitter.java:67;
example impls src/examples/pipes/impl/wordcount-simple.cc). The engine
analog is ``rdd.pipe``: rows serialized as delimited lines to the
executable's stdin, transformed lines read back from stdout — exactly the
Streaming contract (line in, line out), which subsumes what this fork's
pipes examples compute.

This is a COMPAT surface: the modern fast path for custom per-row logic
is Arrow-batched pandas UDFs (10-100x less serialization overhead). Use
pipe_records only to reuse an existing external executable unchanged.

Scale: the executable runs once per partition, streaming — no
materialization; stdin/stdout backpressure bounds memory. The process
must be present on every executor (ship via ``spark.files`` on a real
cluster, the DistributedCache model).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pipe_records(
    df: DataFrame, command: str, output_schema_ddl: str, sep: str = "\t"
) -> DataFrame:
    """Pipe each row through an external command, line-per-record.

    Rows are serialized as `sep`-joined fields (nulls -> empty string) to
    the command's stdin; each stdout line is parsed back against
    ``output_schema_ddl`` with the same separator. The command may emit
    0..n lines per input line (map semantics, 1->n allowed).
    """
    lines = df.rdd.map(
        lambda row: sep.join("" if v is None else str(v) for v in row)
    ).pipe(command)
    # explicit schema: toDF's sampling inference throws on an empty RDD
    # (a filter-to-zero input must yield zero rows, not a crash), and
    # skipping inference avoids a driver-side sampling job besides
    lines_df = df.sparkSession.createDataFrame(
        lines.map(lambda line: (line,)), "line string"
    )
    return (
        lines_df.select(
            F.from_csv(F.col("line"), output_schema_ddl, {"sep": sep}).alias("r")
        ).select("r.*")
    )

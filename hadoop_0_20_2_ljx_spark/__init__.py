"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference MapReduce engine (JerryLead/Hadoop-0.20.2-LJX).

The reference is a *physical* dataflow engine: users hand-assemble
scan -> map -> partition/sort/shuffle -> reduce -> sink pipelines as a
JobConf (reference: src/mapred/org/apache/hadoop/mapred/JobConf.java).
This package re-expresses every capability Spark-first: the DataFrame /
Spark SQL API declares the logical plan and Catalyst/Tungsten supply the
physical layer (partial aggregation, pushdown, join strategy selection)
that the reference required users to encode by hand.

Layout:
    session     SparkSession factory tuned for the engine
    catalog     fixture-table catalog over the driver parquet dirs
    operators/  the operator library of SURVEY.md section 2
    functions/  portable scalar helpers (cross-engine deterministic hash)
    plans/      JobControl-style DAG pipeline runner
    streaming/  Structured Streaming extensions (tumbling/session windows)
    extensions/ training-data-pipeline ops (dedup, similarity, text stats)
"""

__version__ = "0.1.0"

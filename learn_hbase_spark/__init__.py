"""PySpark-native analytics engine with the capability surface of
``lqso91/learn-hbase`` (a wide-column HBase meter-data ETL pipeline),
rebuilt Spark-first rather than ported.

Layout
------
- :mod:`learn_hbase_spark.session`    — SparkSession factory (AQE, shuffle sizing)
- :mod:`learn_hbase_spark.schemas`    — typed schemas for all test tables
- :mod:`learn_hbase_spark.tables`     — parquet table loaders
- :mod:`learn_hbase_spark.widetable`  — WideTable API (HBase-capability analog)
- :mod:`learn_hbase_spark.operators`  — filters/joins/window/dedup/similarity
- :mod:`learn_hbase_spark.functions`  — scalar + text-analysis functions
- :mod:`learn_hbase_spark.sources`    — JDBC interface, CSV sink
- :mod:`learn_hbase_spark.pipeline`   — the reference 3-stage pipeline replica
- :mod:`learn_hbase_spark.streaming`  — Structured Streaming extensions
"""

__version__ = "0.1.0"

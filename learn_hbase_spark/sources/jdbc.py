"""S1/S2 — JDBC sources behind a substitutable interface.

The reference streams two JDBC sources single-threaded (MySQL-protocol dim
scan with ``fetchSize=Integer.MIN_VALUE``, YhCldETL.java:54-68; Oracle fact
scan with ``fetchSize=1000``, RdlETL.java:92-101) and parallelizes manually
by looping region codes. Spark-first: one partitioned ``spark.read.jdbc``
whose `partitionColumn` IS that loop — N concurrent range queries, one per
task, with predicate pushdown from Catalyst.

Exercised LIVE against embedded Derby (the jar ships with Spark) in
`tests/test_jdbc_live.py`: real driver resolution, partitioned range
queries, predicate pushdown into remote SQL, fetchsize. `ParquetStandin`
remains the substitute for pipeline tests that don't need a database.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcSource:
    """Config for a partitioned JDBC read."""

    url: str
    table: str  # table name or "(subquery) alias" — pushes the SQL down
    partition_column: str | None = None  # e.g. "dqbh" (YhCldETL.java:29-31)
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int | None = None
    fetch_size: int = 1000  # RdlETL.java:98
    options: dict[str, str] = field(default_factory=dict)

    def read(self, spark: SparkSession) -> DataFrame:
        reader = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.table)
            .option("fetchsize", str(self.fetch_size))
        )
        if self.partition_column is not None:
            reader = (
                reader.option("partitionColumn", self.partition_column)
                .option("lowerBound", str(self.lower_bound))
                .option("upperBound", str(self.upper_bound))
                .option("numPartitions", str(self.num_partitions or 8))
            )
        for k, v in self.options.items():
            reader = reader.option(k, v)
        return reader.load()

    def register_catalog(self, spark: SparkSession, name: str) -> str:
        """Expose this source as a DataSource-V2 JDBC table catalog.

        The plain ``spark.read.jdbc`` path (``read``) is V1: it pushes
        filters and column pruning but NOT aggregates. Registering a
        ``JDBCTableCatalog`` switches table reads to the V2 scan builder,
        where Catalyst additionally pushes ``COUNT/SUM/MIN/MAX/AVG`` and
        ``GROUP BY`` into the remote database — at scale the difference
        between shipping a 3-row aggregate and shipping the whole fact
        table over the wire. Tables resolve as ``<name>.<schema>.<table>``
        (e.g. ``mydb.APP.METERS`` on Derby). Catalog instances are cached
        per session after first resolution, so register before first use.
        """
        base = f"spark.sql.catalog.{name}"
        spark.conf.set(
            base,
            "org.apache.spark.sql.execution.datasources.v2.jdbc."
            "JDBCTableCatalog",
        )
        spark.conf.set(f"{base}.url", self.url)
        spark.conf.set(f"{base}.pushDownAggregate", "true")
        spark.conf.set(f"{base}.pushDownLimit", "true")
        for k, v in self.options.items():
            spark.conf.set(f"{base}.{k}", v)
        return name


@dataclass
class ParquetStandin:
    """Drop-in test substitute: same `read(spark)` contract, parquet-backed."""

    path: str

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)


def read_csv_permissive(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
):
    """Ingest-edge CSV read with PERMISSIVE row-error semantics.

    The reference try/catches per row and silently drops failures
    (RdlETL.java:141-143 — SURVEY §2.10). Here malformed rows are neither
    dropped nor fatal: they land in `corrupt_col` for quarantine, and the
    caller decides (count them, route them to a dead-letter sink). Compute
    errors past the ingest edge still fail loudly.
    """
    return (
        spark.read.schema(f"{schema}, {corrupt_col} STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("header", True)
        .csv(path)
    )

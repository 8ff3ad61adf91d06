"""File sources: schema-enforced CSV / JSON-lines readers.

The reference's only source is JDBC (SURVEY §2.1 S1/S2); real deployments
of this engine also land files. The rules that matter at 100 TB:

- **Always pass an explicit schema.** Inference reads the data twice and
  pins the job to whatever the sampled files happened to contain; an
  explicit schema is one footer-free pass and a stable contract.
- **Never drop bad rows silently.** PERMISSIVE mode + a corrupt-record
  column turns malformed input into auditable rows (count them, route them
  to a quarantine sink) instead of a mid-job crash (FAILFAST) or silent
  loss (DROPMALFORMED).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Schema-enforced CSV read. Malformed lines surface in
    ``_corrupt_record`` (null for good rows) rather than failing the job
    or vanishing."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("header", header)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """Schema-enforced JSON-lines read with corrupt-record capture."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): route rows with a corrupt payload aside for
    audit instead of mixing half-parsed rows into the pipeline.

    The parsed frame is cached first: Spark refuses a query whose required
    schema is ONLY the internal corrupt-record column of a raw file scan
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the supported pattern is to
    materialize the parse once, then split. Both halves share that one
    scan; in a 100 TB ingest this split runs per landed batch, not over
    the full corpus, so the cache is batch-sized.
    """
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink (zlib default). ORC is the interchange format for
    Hive-ecosystem consumers the way parquet is for Spark-native ones;
    both carry column stats for predicate pushdown, so a table landed here
    stays scan-prunable."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """ORC source. Explicit schema skips footer sampling (same rule as the
    CSV/JSON readers above); ORC scans support filter pushdown and column
    pruning exactly like parquet, so downstream plans keep their shape."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML sink (Spark 4 native XML data source — no external package).
    XML is the land-from-enterprise-feeds format; one element per row."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode(mode)
        .save(path)
    )


def read_xml(
    spark: SparkSession,
    path: str,
    schema: StructType,
    row_tag: str = "row",
) -> DataFrame:
    """Schema-enforced XML read with corrupt-record capture — same
    PERMISSIVE + quarantine contract as the CSV/JSON readers (malformed
    elements become auditable rows, never silent drops)."""
    return (
        spark.read.format("xml")
        .schema(_with_corrupt(schema))
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .load(path)
    )

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

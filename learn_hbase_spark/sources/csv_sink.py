"""S7 — partitioned, rotated CSV export.

The reference hand-rolls ~60 LoC for this (``RdlETL3.java``: per-prefix dirs
:37-45, header :155-164, 500k-row file rotation :117-128, rerun cleanup
:146-153). In Spark it's writer options: ``header``, ``maxRecordsPerFile``,
``partitionBy``, ``mode("overwrite")`` — the task-commit protocol replaces
the manual cleanup, and rotation happens per task without a driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_csv(
    df: DataFrame,
    path: str,
    partition_by: str | None = None,
    max_records_per_file: int = 500_000,
    null_value: str = "",
) -> None:
    """Write `df` as headered CSV with file rotation, one dir per partition.

    `null_value=""` reproduces the reference's null→empty-string rendering
    at the edge (X7, RdlETL.java:121) while internal nulls stay true nulls.
    """
    writer = (
        df.write.option("header", True)
        .option("maxRecordsPerFile", max_records_per_file)
        .option("nullValue", null_value)
        .option("emptyValue", "")
        .mode("overwrite")
    )
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.csv(path)


def with_export_prefix(df: DataFrame, rowkey: str = "rowkey") -> DataFrame:
    """Derive the reference's per-prefix export directory key (RdlETL3.java:37-45)."""
    return df.withColumn("prefix", F.substring(rowkey, 1, 4))

"""Parquet table loaders for the driver testdata directories."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Plain `spark.read.parquet` keeps Catalyst's
    predicate pushdown / column pruning on the scan (SURVEY §4).

    `events.ts` has shipped as both TIMESTAMP(NANOS) (which Spark's parquet
    reader rejects without the nanos-as-long legacy flag) and plain
    TIMESTAMP(MICROS) across driver data generations; detect from the file
    and normalize to a µs timestamp either way (lossless: the generator
    emits µs-precision values)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Scope the legacy flag to this read: it is consumed at plan time,
        # so restoring it immediately leaves the caller's session conf
        # untouched (no hidden global side effect on later parquet reads).
        flag = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(flag, None)
        spark.conf.set(flag, "true")
        try:
            df = spark.read.parquet(path)
        finally:
            if prev is None:
                spark.conf.unset(flag)
            else:
                spark.conf.set(flag, prev)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # Session TZ is pinned UTC, so NTZ -> LTZ is value-preserving;
            # downstream ops (unix_micros, range windows) expect TIMESTAMP.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so `spark.sql` works over them —
    mirrors the driver's DuckDB-side view registration."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` hash-bucketed (and optionally sorted) by the join key.

    Bucketing pre-shuffles ONCE at write time: two tables bucketed by the
    same key into the same bucket count join with NO exchange on either side
    (and no sort if `sort_cols` matches) — the 100 TB answer for fact-fact
    joins repeated across runs, where a per-query shuffle of the big side
    would dominate the job. The reference approximates this with its rowkey
    prefix ranges; bucketing generalizes it to any equi-join key.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)

"""Custom Python data source (Spark 4 DataSource API)."""

from __future__ import annotations

import pytest

from learn_hbase_spark.sources.pysource import SyntheticEventsDataSource


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(SyntheticEventsDataSource)


def _read(spark, **opts):
    reader = spark.read.format("synthetic_events")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def test_reads_requested_rows_with_declared_schema(spark):
    df = _read(spark, n_rows=1000, n_partitions=8)
    assert df.count() == 1000
    assert [f.name for f in df.schema.fields] == [
        "event_id", "user_id", "event_type", "value",
    ]
    assert df.rdd.getNumPartitions() == 8


def test_partition_count_does_not_change_data(spark):
    """Per-row seeding: the dataset is a function of (seed, row id) only,
    so re-partitioning the scan yields byte-identical contents."""
    a = sorted(map(tuple, _read(spark, n_rows=500, n_partitions=2).collect()))
    b = sorted(map(tuple, _read(spark, n_rows=500, n_partitions=16).collect()))
    assert a == b


def test_source_composes_with_engine_operators(spark):
    """The Python source is a first-class scan: filters/aggregates over it
    plan and run like any other source."""
    from pyspark.sql import functions as F

    df = _read(spark, n_rows=2000, n_partitions=4)
    agg = (
        df.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    rows = agg.collect()
    assert rows and all(r["n"] >= 1 for r in rows)
    total = sum(r["n"] for r in rows)
    plain = df.filter(F.col("event_type") == "purchase").count()
    assert total == plain


def test_streaming_read_resumes_from_checkpoint_offsets(spark, tmp_path):
    """The streaming face advances a row-id offset cursor per micro-batch;
    a SimpleDataSourceStreamReader under availableNow drains ONE prefetched
    batch per run, so successive runs against the SAME checkpoint resume
    from the stored offset — and the union of runs reproduces the batch
    dataset exactly (offset ranges + per-row seeding = replayable)."""
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    for _ in range(3):  # 600 rows / 250 per batch -> 3 runs
        q = (
            spark.readStream.format("synthetic_events")
            .option("n_rows", 600).option("rows_per_batch", 250)
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    streamed = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    batch = sorted(map(tuple, _read(spark, n_rows=600).collect()))
    assert streamed == batch

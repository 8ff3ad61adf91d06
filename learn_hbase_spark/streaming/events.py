"""Structured Streaming extensions (north-star; the reference is strictly
batch — SURVEY §2.8 — its 'incremental' mode is manual re-runs of idempotent
upserts).

The streaming analog of the reference's ingest is: file/Kafka source →
the same declarative transforms → idempotent sink. Watermarked windowed
aggregation replaces the driver-scheduled day loop; ``availableNow`` makes
the same query testable as a bounded run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import EVENTS


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based event stream with the testdata `events` schema. At
    production scale the same plan reads Kafka; only this reader changes."""
    reader = spark.readStream.schema(EVENTS)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_event_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling-window counts with late-data handling.

    The watermark bounds state: rows later than `watermark` are dropped and
    their windows finalized — the streaming replacement for the reference's
    'rerun the whole day' recovery model.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_bounded(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain everything currently available and stop (testable streaming)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

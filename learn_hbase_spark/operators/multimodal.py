"""Multimodal (image/audio/video) column plumbing (north-star M4).

Media are opaque ``binary`` columns plus a typed metadata struct; decode /
feature-extract run as Arrow-batched functions over ``mapInPandas`` so each
task processes a columnar batch without per-row Python overhead. The actual
codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the decode body
is a deterministic fake behind ``_decode_bytes`` — the Spark-side contract
(schema, batching, partition flow) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DataType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)


def _id_type(media: DataFrame) -> DataType:
    """The kernels are id-type-polymorphic: ``media_id`` may be a 64-bit
    long (documents-table-derived media) or a 32-hex md5 string (the
    ``sources.files.read_binary_files`` crawl edge, where a 64-bit id would
    silently birthday-merge distinct files at ~1e9-file scale). Output
    schemas copy whatever type the input carries; everything else in the
    contract is fixed."""
    return media.schema["media_id"].dataType


def _feature_schema(id_type: DataType) -> StructType:
    return StructType(
        [
            StructField("media_id", id_type, False),
            StructField("kind", StringType(), False),
            StructField("n_bytes", LongType(), True),
            StructField("checksum", LongType(), True),
            StructField("feature_dim", IntegerType(), True),
        ]
    )


FEATURE_SCHEMA = _feature_schema(LongType())


def _decode_bytes(payload: bytes | None) -> tuple[int, int]:
    """STUB decode. A real deployment replaces this body with PIL/ffmpeg;
    the deterministic fake keeps tests runnable in this container.

    Returns (n_bytes, checksum).
    """
    if payload is None:
        return 0, 0
    return len(payload), sum(payload) % (2**31)


def extract_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over media payloads.

    `mapInPandas` streams column batches into Python once per batch — the
    only sane shape for binary-heavy data (row-at-a-time UDFs would
    serialize each payload separately).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [d[0] for d in decoded],
                    "checksum": [d[1] for d in decoded],
                    "feature_dim": [64] * len(pdf),
                }
            )

    return media.mapInPandas(_extract, schema=_feature_schema(_id_type(media)))


def _resized_schema(id_type: DataType) -> StructType:
    return StructType(
        [
            StructField("media_id", id_type, False),
            StructField("payload", BinaryType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
        ]
    )


RESIZED_SCHEMA = _resized_schema(LongType())


def resize_images(
    media: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Image resize over binary payloads, Arrow-batched via mapInPandas.

    The pixel transform is a STUB (PIL not in this container): the fake
    'resize' truncates/pads the payload to a deterministic length derived
    from the target box, preserving the real contract — binary in, binary
    out, new dimension metadata, batch-at-a-time flow. Swap `_fake_resize`
    for `PIL.Image.open(...).resize(...)` in a real deployment.
    """

    def _fake_resize(payload: bytes | None) -> bytes | None:
        if payload is None:
            return None
        n = (target_w * target_h) // 256 + 1
        return (payload * (n // max(len(payload), 1) + 1))[:n]

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [_fake_resize(p) for p in pdf["payload"]],
                    "width": [target_w] * len(pdf),
                    "height": [target_h] * len(pdf),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        _resize, schema=_resized_schema(_id_type(media))
    )


def _audio_schema(id_type: DataType) -> StructType:
    return StructType(
        [
            StructField("media_id", id_type, False),
            StructField("n_samples", LongType(), True),
            StructField("rms", LongType(), True),
        ]
    )


AUDIO_SCHEMA = _audio_schema(LongType())


def audio_features(media: DataFrame) -> DataFrame:
    """Audio feature extraction stub (torchaudio/ffmpeg absent): treats the
    payload bytes as the sample stream and emits deterministic per-clip
    aggregates. Real deployments replace the body; the mapInPandas batch
    contract is the tested surface."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = [len(p) if p is not None else 0 for p in pdf["payload"]]
            rms = [
                int(sum(b * b for b in p) ** 0.5) if p else 0
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "n_samples": n, "rms": rms}
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        _extract, schema=_audio_schema(_id_type(media))
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame timestamp.

    The explode happens JVM-side (sequence over duration); only the actual
    pixel decode would cross into Python. Decode itself is stubbed."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ms", "payload")
    )

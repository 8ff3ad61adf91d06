"""Document chunking — the context-window primitive of a training-data
pipeline: split each document into overlapping fixed-size word windows
(LLM pretraining shards, RAG passage extraction).

Scale posture: one projection computes the word array, one explode emits
chunk starts, one projection slices — all JVM expression tree, no shuffle
at all (chunking is embarrassingly per-row). Output rows carry only the
chunk text, never re-carry the full document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text


def chunk_words(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Overlapping word-window chunks: (doc_id, chunk_id, chunk_text,
    n_words).

    Windows start every ``chunk_size - overlap`` words; the last window may
    be shorter (never empty); a document shorter than one window yields
    exactly one chunk. The word array is materialized as an attribute in a
    prior projection (HOF lambdas re-evaluate per element otherwise — the
    CSE pitfall documented in :func:`dedup.shingle_rows`).
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    words = F.split(normalize_text(F.col(text_col)), " ")
    with_words = df.select(F.col(id_col).alias("doc_id"), words.alias("_w"))
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size("_w") - overlap, F.lit(1)),
        F.lit(stride),
    )
    exploded = with_words.select(
        "doc_id", "_w", F.explode(starts).alias("_start")
    )
    piece = F.slice(F.col("_w"), F.col("_start"), chunk_size)
    return exploded.select(
        "doc_id",
        ((F.col("_start") - 1) / stride).cast("int").alias("chunk_id"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_words"),
    )

"""Embedding similarity search (north-star extension, SURVEY §7.2 M4).

Two tiers:
- ``cosine_topk``: exact brute-force top-k — the correctness baseline. The
  query side is broadcast (it's small by construction); the corpus side
  streams through one codegen'd stage; top-k is a per-query window. No
  driver-side collection.
- ``lsh_topk``: random-hyperplane LSH bucketing — the 100 TB path. Corpus
  vectors hash into sign-pattern buckets; only colliding buckets are
  compared, cutting the candidate set by ~2^planes while recall stays high
  for near-neighbors (Charikar 2002 SimHash argument for cosine).

Dot products use ``F.zip_with`` + ``F.aggregate`` — pure JVM expression
tree, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns (computed in double)."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    return _dot(da, db) / (_norm(da) * _norm(db))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact brute-force cosine top-k per query vector.

    Returns (query_id, neighbor_id, rank, sim) — rank 1..k by descending
    similarity, ties broken by ascending neighbor id (deterministic).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    pairs = c.join(F.broadcast(q), how="cross")
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn("sim", cosine(F.col("_qv"), F.col("_cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, sim) for every
    pair with cosine >= threshold, id_a < id_b.

    Norms are computed once per vector in a pre-join projection, so the
    pairwise stage evaluates one dot product per pair. The id inequality is
    a join condition, which on the all-pairs form makes this a broadcast
    nested-loop join — the exact baseline. The 100 TB path prefixes it with
    ``hyperplane_bucket`` partitioning (compare only within buckets), same
    scoring expression.
    """
    prepped = df.select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    ).withColumn("_n", _norm(F.col("_v")))
    a, b = prepped.alias("a"), prepped.alias("b")
    sim = _dot(F.col("a._v"), F.col("b._v")) / (F.col("a._n") * F.col("b._n"))
    return (
        a.join(b, F.col("a._id") < F.col("b._id"))
        .withColumn("_sim", sim)
        .filter(F.col("_sim") >= threshold)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.round("_sim", 6).alias("sim"),
        )
    )


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id for a vector under fixed hyperplanes.

    The planes are deterministic constants (supplied by the caller), so the
    bucketing is reproducible across engines and runs.
    """
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket.bitwiseOR(
            F.when(_dot(F.transform(vec, lambda x: x.cast("double")), arr) >= 0,
                   F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
        )
    return bucket


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: compare only vectors sharing an LSH bucket.

    At 100 TB the bucket column is also the natural storage partition key:
    queries then prune to a handful of partitions instead of the full scan.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
    ).withColumn("_bk", hyperplane_bucket(F.col("_qv"), planes))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
    ).withColumn("_bk", hyperplane_bucket(F.col("_cv"), planes))
    pairs = c.join(F.broadcast(q), on="_bk").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.withColumn("sim", cosine(F.col("_qv"), F.col("_cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )

"""Sketch-based approximate statistics — the 100 TB path for profiling.

The exact profiles in ``operators.corpus`` (sort-based quantiles, exact
count-distinct) are oracle-able reference implementations; at cluster scale
their cost is a full sort / an Expand-multiplied aggregate. These sketch
variants trade exactness for single-pass, constant-memory, mergeable state:

- ``approx_distinct`` — HyperLogLog++ (relativeSD-tunable), built into
  Spark's ``approx_count_distinct``.
- ``approx_quantiles`` — Greenwald-Khanna/t-digest style
  ``percentile_approx`` with an accuracy knob.
- ``heavy_hitters`` — frequent items over a column; exact groupBy-count
  top-k here (itself partial-aggregable), with the count-min sketch
  aggregate available for the streaming/merge path.

All are deterministic for a fixed input and config, but the sketch values
are engine-specific — so these register with rows-only checks, and the unit
tests assert tolerance against the exact operators instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, cols: list[str], rsd: float = 0.02
) -> DataFrame:
    """One row: HLL++ approximate distinct count per column, single pass.

    Unlike exact multi-column ``count_distinct``, HLL aggregates do not
    force an ``Expand`` (row multiplication per column) — each column keeps
    one sketch per task, merged at the final reduce.
    """
    return df.agg(
        *[
            F.approx_count_distinct(c, rsd=rsd).alias(f"nd_{c}")
            for c in cols
        ]
    )


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    probs: list[float] = (0.1, 0.5, 0.9),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate quantiles: one partial-aggregable sketch per
    group — no per-group sort, no row_number window. The scale twin of
    ``corpus.length_profile``."""
    q = F.percentile_approx(value_col, list(probs), accuracy).alias("qs")
    out = df.groupBy(group_col).agg(q)
    return out.select(
        group_col,
        *[
            F.col("qs")[i].alias(f"p{int(p * 100):02d}")
            for i, p in enumerate(probs)
        ],
    )


def heavy_hitters(
    df: DataFrame, col: str, k: int = 10, min_count: int = 1
) -> DataFrame:
    """Top-k most frequent values of ``col`` with exact counts.

    groupBy-count is map-side partial, so the shuffle carries one row per
    distinct value per task; the final top-k is a single ``orderBy.limit``
    (Spark executes it as TakeOrdered — no global sort materialization).
    Deterministic tiebreak on the value itself.
    """
    return (
        df.groupBy(F.col(col).alias("value"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.col("n").desc(), F.col("value").asc())
        .limit(k)
    )


def hll_rollup(
    df: DataFrame, key_col: str, value_col: str, lg_k: int = 12
) -> DataFrame:
    """Persistable re-aggregatable distinct-count rollup via Apache
    DataSketches HLL (Spark 4 ``hll_sketch_agg``/``hll_union_agg``).

    The 100 TB profiling pattern ``approx_count_distinct`` cannot give
    you: the per-key state here is a STORABLE binary sketch — write the
    per-key sketch table once, then answer any coarser rollup (here the
    ALL row) by merging sketches, never rescanning the raw data. Daily
    sketch partitions → monthly/yearly distincts at merge cost, exactly
    how warehouse distinct-count marts are maintained.

    Returns one row per key plus an ``ALL`` row, both estimated from the
    same sketch state (the ALL row via ``hll_union_agg``), so the rollup
    is consistent with its parts up to sketch representation error
    (union promotes coupon-list state to dense).
    """
    sketches = df.groupBy(F.col(key_col).cast("string").alias(key_col)).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("_sk")
    )
    per_key = sketches.select(
        key_col,
        F.hll_sketch_estimate("_sk").alias("distinct_est"),
    )
    total = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk", False)).alias(
            "distinct_est"
        )
    ).select(F.lit("ALL").alias(key_col), "distinct_est")
    return per_key.unionByName(total)

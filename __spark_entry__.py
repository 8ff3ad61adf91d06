"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All implementations live in :mod:`learn_hbase_spark`; this file is the thin
contract surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from learn_hbase_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's core
    analytic (guarded lead-difference per key, SURVEY §2.5 W1) on the
    events table."""
    return _q.rdl_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ north-star
    M4 extensions). Each callable takes (spark, sf_dir) → DataFrame."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query. Omitted only for the
    declared rows-only tail (float fixpoints, learned iterative loops,
    engine sketch bytes, the xxhash64 hash family) — each of those
    carries a pinned pytest reference check and, where one exists, an
    exact oracle twin of its deterministic stage."""
    return _q.oracle_sql()

"""Skew-stress: the reference's 15-coarse-prefix hot-key shape (SURVEY §7.3)
through both mitigation paths — manual salting (operators.joins.salted_join)
and AQE's adaptive skew-join split — at sf0.1 volumes.
"""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from learn_hbase_spark.operators.joins import salted_join

SF_BENCH = "/root/testdata/sf0.1"


@contextlib.contextmanager
def _confs(spark, **kv):
    saved = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        try:
            saved[key] = spark.conf.get(key)
        except Exception:
            saved[key] = None
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in saved.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def _skewed_sides(spark):
    """Left: sf0.1 orders keyed by a deliberately hot prefix — ~80% of rows
    share one key, the rest spread over 14 more (the reference's 15 coarse
    grid-branch prefixes, RdlETL.java:63-64). Right: one small dim row per
    prefix."""
    orders = spark.read.parquet(f"{SF_BENCH}/orders.parquet")
    left = orders.select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_orderkey") % 10 < 8, F.lit("0401"))
        .otherwise(F.format_string("04%02d", (F.col("o_orderkey") % 14) + 1))
        .alias("prefix"),
    )
    right = spark.createDataFrame(
        [(f"04{i:02d}", f"branch_{i}") for i in range(15)],
        "prefix string, branch_name string",
    )
    return left, right


def test_salted_join_equals_plain_join(spark):
    """salted_join must be a pure performance rewrite: bit-identical rows
    to the unsalted join under an 80%-hot key."""
    left, right = _skewed_sides(spark)
    plain = left.join(right, on=["prefix"], how="inner")
    salted = salted_join(left, right, on=["prefix"], salt_buckets=8)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must actually land in every salt bucket (the
    whole-row hash is independent of the join key), otherwise salting is a
    no-op rename."""
    left, _ = _skewed_sides(spark)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8))
    buckets = (
        left.filter(F.col("prefix") == "0401")
        .select(salt.cast("int").alias("b"))
        .distinct()
        .count()
    )
    assert buckets == 8


def test_aqe_splits_skewed_join(spark):
    """With thresholds scaled to sf0.1, AQE must mark the hot partition and
    split it (SortMergeJoin(skew=true) in the final adaptive plan) while
    the result stays correct."""
    left, right = _skewed_sides(spark)
    # fatten the right side so Spark can't just broadcast it away, and
    # drop thresholds so sf0.1's hot partition qualifies as skewed
    with _confs(
        spark,
        **{
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        # many map tasks, as a real large-scan stage would have: AQE's skew
        # split works at mapper granularity, so a single-file single-task
        # scan (sf0.1 locally) could never be split
        joined = left.repartition(8).join(right, on=["prefix"], how="inner")
        expected = 150_000  # every orders row matches exactly one dim row
        # collect() (not count(): that builds a separate plan) so THIS
        # DataFrame's adaptive plan executes and finalizes
        assert len(joined.collect()) == expected
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan


def test_skew_report_has_no_unpartitioned_window(spark):
    """skew_report is the library's scale-diagnostic primitive; its own plan
    must not carry the anti-pattern it exists to detect. An earlier revision
    row_number()-ed one row per distinct key through Window.orderBy with no
    partitionBy — a single-task global sort over O(distinct keys) rows at
    100 TB. The rewrite computes percentiles with the partial-aggregable
    exact `percentile` aggregate, so the physical plan must contain NO
    Window operator at all."""
    from learn_hbase_spark import queries

    df = queries.queries()["skew_report"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    # And it still aggregates partially: two-phase HashAggregate for the
    # per-key counts plus the ObjectHashAggregate pair for percentile.
    assert "partial" in plan.lower(), plan

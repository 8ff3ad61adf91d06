"""Time-bucketed range join and single-pass column profiling."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from learn_hbase_spark.operators import corpus as corpus_ops
from learn_hbase_spark.operators.joins import range_join


def _ts(s: int):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_range_join_matches_naive(spark):
    left = spark.createDataFrame(
        [(i, 1, _ts(i * 40)) for i in range(20)],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100 + i, 1, _ts(i * 55 + 7)) for i in range(20)],
        "event_id long, user_id long, ts timestamp",
    )
    got = {
        (r["event_id"], r["event_id_r"])
        for r in range_join(
            left, right, "ts", "ts", 1, 120_000_000, on=["user_id"]
        ).collect()
    }
    naive = {
        (l["event_id"], r["event_id"])
        for l in left.collect()
        for r in right.collect()
        if 1e-6 <= (r["ts"] - l["ts"]).total_seconds() <= 120
    }
    assert got == naive and got  # non-empty and identical to brute force


def test_range_join_bucket_boundaries(spark):
    # right exactly at left + upper bound, and exactly at left (gap 0)
    left = spark.createDataFrame(
        [(1, _ts(0))], "event_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(2, _ts(100)), (3, _ts(0)), (4, _ts(101))],
        "event_id long, ts timestamp",
    )
    got = {
        r["event_id_r"]
        for r in range_join(left, right, "ts", "ts", 0, 100_000_000).collect()
    }
    assert got == {2, 3}  # inclusive bounds; 101s is out


def test_column_profile(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a")], "id long, v string"
    )
    rows = {r["column"]: r for r in corpus_ops.column_profile(df).collect()}
    assert rows["id"]["n"] == 3 and rows["id"]["n_null"] == 0
    assert rows["id"]["n_distinct"] == 3
    assert (rows["id"]["min_s"], rows["id"]["max_s"]) == ("1", "3")
    assert rows["v"]["n_null"] == 1 and rows["v"]["n_distinct"] == 1
    assert (rows["v"]["min_s"], rows["v"]["max_s"]) == ("a", "a")

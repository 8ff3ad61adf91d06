"""Sketch operators: error bounds vs the exact operators they approximate."""

from __future__ import annotations

from pyspark.sql import functions as F

from learn_hbase_spark.operators import sketches


def test_heavy_hitters_exact_counts_and_tiebreak(spark):
    rows = [(v,) for v in ["a"] * 5 + ["b"] * 3 + ["c"] * 3 + ["d"] * 1]
    df = spark.createDataFrame(rows, "v string")
    got = [(r["value"], r["n"]) for r in sketches.heavy_hitters(df, "v", k=3).collect()]
    # b and c tie at 3 → value asc breaks it
    assert got == [("a", 5), ("b", 3), ("c", 3)]


def test_approx_distinct_within_rsd(spark):
    n = 5000
    df = spark.createDataFrame([(i, i % 100) for i in range(n)], "id long, m long")
    row = sketches.approx_distinct(df, ["id", "m"], rsd=0.02).first()
    assert abs(row["nd_id"] - n) / n < 0.05  # 2% rsd → 5% is generous
    assert abs(row["nd_m"] - 100) / 100 < 0.05


def test_approx_quantiles_near_exact(spark):
    df = spark.createDataFrame(
        [(i % 2, float(i)) for i in range(1, 1001)], "g int, v double"
    )
    rows = {r["g"]: r for r in sketches.approx_quantiles(df, "v", "g").collect()}
    for g in (0, 1):
        assert abs(rows[g]["p50"] - 500) <= 10
        assert abs(rows[g]["p90"] - 900) <= 10
        assert abs(rows[g]["p10"] - 100) <= 10

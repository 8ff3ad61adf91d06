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


def test_hll_rollup_tolerance_and_merge_consistency(spark):
    """Per-key estimates within HLL error of exact; the ALL row (sketch
    union) agrees with sketching the raw data directly within sketch
    error — re-aggregation must not lose real information."""
    from pyspark.sql import functions as F

    from learn_hbase_spark.operators.sketches import hll_rollup

    df = spark.range(5000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 1700).alias("v")
    )
    got = {r["g"]: r["distinct_est"] for r in hll_rollup(df, "g", "v").collect()}
    exact = {
        str(r["g"]): r["n"]
        for r in df.groupBy("g").agg(F.count_distinct("v").alias("n")).collect()
    }
    exact["ALL"] = df.select("v").distinct().count()
    for k, est in got.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v", F.lit(12))).alias("e")
    ).collect()[0]["e"]
    # union-of-sketches vs direct sketching can differ by representation
    # promotion (coupon-list vs dense) — equal within sketch error
    assert abs(got["ALL"] - direct) / direct < 0.01


def test_hll_merge_law_partitioning_invariant(spark):
    """The DataSketches HLL merge law, pinned at the right strength: the
    REGISTER state is a per-slot max (associative/commutative/idempotent),
    but the library's estimate is path-dependent — a sketch built in one
    partition reports through the HIP estimator while merged partials
    report through the composite estimator — so the law shows up as (a)
    estimates invariant within sketch error under ANY partitioning /
    duplication of the input, and (b) the same lineage re-collected is
    bit-identical (determinism)."""
    from pyspark.sql import functions as F

    from learn_hbase_spark.operators.sketches import hll_rollup

    df = spark.range(4000).select(
        (F.col("id") % 5).alias("g"), (F.col("id") % 997).alias("v")
    )
    one = dict(map(tuple, hll_rollup(df.repartition(1), "g", "v").collect()))
    many = dict(map(tuple, hll_rollup(df.repartition(13), "g", "v").collect()))
    # idempotence: duplicating every input row adds no distinct items
    dup = dict(map(tuple, hll_rollup(df.union(df).repartition(7),
                                     "g", "v").collect()))
    assert one.keys() == many.keys() == dup.keys()
    for k in one:
        assert abs(many[k] - one[k]) <= 0.02 * one[k], (k, one[k], many[k])
        assert abs(dup[k] - one[k]) <= 0.02 * one[k], (k, one[k], dup[k])
    # determinism: the same merge tree re-executed is bit-identical
    again = dict(map(tuple, hll_rollup(df.repartition(13), "g", "v").collect()))
    assert again == many

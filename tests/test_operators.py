"""Operator-level unit/property tests (SURVEY §5.3)."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from learn_hbase_spark.operators.dedup import first_wins, shingles
from learn_hbase_spark.operators.window import (
    date_spine,
    guarded_lead_diff,
    pivot_days,
    unpivot_days,
)


def test_lead_diff_telescoping_property(spark):
    """Property (SURVEY §5.3): for a strictly positive non-decreasing series,
    sum(rdl/ratio) == last - first; any rollover day yields null."""
    rng = random.Random(7)
    rows = []
    vals = {}
    for key in ["a", "b", "c"]:
        v = rng.uniform(10, 100)
        series = []
        for d in range(30):
            v += rng.uniform(0, 5)
            series.append(v)
            rows.append((key, dt.date(2019, 5, 1) + dt.timedelta(days=d), v))
        vals[key] = series
    df = spark.createDataFrame(rows, "k string, d date, bmz double")
    out = guarded_lead_diff(df, "k", "d", "bmz", ratio=F.lit(2.0)).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    for key, series in vals.items():
        got = sorted(by_key[key], key=lambda r: r["d"])
        total = sum(r["rdl"] / 2.0 for r in got if r["rdl"] is not None)
        assert abs(total - (series[-1] - series[0])) < 1e-6
        assert got[-1]["rdl"] is None  # last day has no lead


def test_lead_diff_rollover_null(spark):
    df = spark.createDataFrame(
        [("a", dt.date(2019, 5, 1), 100.0),
         ("a", dt.date(2019, 5, 2), 40.0),   # rollover: decrease
         ("a", dt.date(2019, 5, 3), 45.0),
         ("a", dt.date(2019, 5, 4), 0.0),    # zero day
         ("a", dt.date(2019, 5, 5), 50.0)],
        "k string, d date, bmz double",
    )
    out = {r["d"].day: r["rdl"] for r in guarded_lead_diff(df, "k", "d", "bmz").collect()}
    assert out[1] is None          # next < cur (rollover guard, F9)
    assert out[2] == 5.0
    assert out[3] is None          # next == 0
    assert out[4] is None          # cur == 0
    assert out[5] is None          # no lead


def test_first_wins_order(spark):
    df = spark.createDataFrame(
        [("k1", 2, "late"), ("k1", 1, "early"), ("k2", 5, "only")],
        "k string, seq int, v string",
    )
    out = {r["k"]: r["v"] for r in first_wins(df, ["k"], [F.col("seq")]).collect()}
    assert out == {"k1": "early", "k2": "only"}


def test_date_spine_dense(spark):
    df = spark.createDataFrame([("a",), ("b",)], "k string")
    out = date_spine(df, ["k"], dt.date(2019, 5, 1), dt.date(2019, 8, 1))
    assert out.count() == 2 * 93  # 93 days inclusive (W2)


def test_pivot_unpivot_roundtrip(spark):
    rows = [
        ("a", dt.date(2019, 5, 1), 1.0),
        ("a", dt.date(2019, 5, 2), 2.0),
        ("b", dt.date(2019, 5, 1), 3.0),
    ]
    df = spark.createDataFrame(rows, "k string, rd_date date, v double")
    days = ["20190501", "20190502"]
    wide = pivot_days(df, "k", "rd_date", "v", days)
    back = unpivot_days(wide, "k", days, value="v")
    got = {(r["k"], r["rd_date"], r["v"]) for r in back.filter(F.col("v").isNotNull()).collect()}
    assert got == set(rows)


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([("one two",), ("a b c d",), ("",)], "text string")
    out = df.select(shingles(F.col("text"), 3).alias("s")).collect()
    assert out[0]["s"] == ["one two"]            # shorter than n → whole text
    assert out[1]["s"] == ["a b c", "b c d"]
    assert out[2]["s"] == [""]                    # degenerate but non-crashing


def test_asof_join_backward_inclusive(spark):
    """Backward as-of: latest right row with t_r <= t_l per key; equal
    timestamps match (inclusive); keys with no prior right row get null."""
    from learn_hbase_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [("k1", 10, "l1"), ("k1", 20, "l2"), ("k1", 5, "l0"), ("k2", 7, "l3")],
        "k string, t long, tag string",
    )
    right = spark.createDataFrame(
        [("k1", 10, 100.0), ("k1", 15, 150.0), ("k2", 99, 900.0)],
        "k string, t long, v double",
    )
    out = asof_join(
        left, right, on=["k"], left_time="t", right_time="t", value_cols=["v"]
    )
    got = {(r["k"], r["t"]): r["v"] for r in out.collect()}
    assert got == {
        ("k1", 5): None,      # before any right row
        ("k1", 10): 100.0,    # equal ts -> inclusive match
        ("k1", 20): 150.0,    # latest prior
        ("k2", 7): None,      # right row is in the future
    }


def test_salted_join_matches_plain_join(spark):
    """Salting is a physical rewrite only: result set identical to the
    plain equi join, including a heavily skewed key."""
    from learn_hbase_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(5)],
        "k string, payload int",
    )
    right = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("absent", "A")], "k string, side string"
    )
    plain = {(r["k"], r["payload"], r["side"])
             for r in left.join(right, "k").collect()}
    salted = {(r["k"], r["payload"], r["side"])
              for r in salted_join(left, right, on=["k"], salt_buckets=8).collect()}
    assert salted == plain and len(salted) == 505


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized cross-check: asof_join agrees with pandas.merge_asof
    (backward, allow_exact_matches) on every key/timestamp draw."""
    import pandas as pd

    from learn_hbase_spark.operators.joins import asof_join

    rng = random.Random(13)
    left_rows = [
        (f"k{rng.randint(0, 5)}", rng.randint(0, 1000), i) for i in range(300)
    ]
    # right must be unique per (key, t) — dedup the draw
    seen = set()
    right_rows = []
    for _ in range(200):
        k, t = f"k{rng.randint(0, 5)}", rng.randint(0, 1000)
        if (k, t) not in seen:
            seen.add((k, t))
            right_rows.append((k, t, float(rng.randint(0, 10_000))))
    left = spark.createDataFrame(left_rows, "k string, t long, seq long")
    right = spark.createDataFrame(right_rows, "k string, t long, v double")

    got = asof_join(
        left, right, on=["k"], left_time="t", right_time="t", value_cols=["v"]
    ).toPandas().sort_values("seq").reset_index(drop=True)

    lpd = pd.DataFrame(left_rows, columns=["k", "t", "seq"]).sort_values("t", kind="stable")
    rpd = pd.DataFrame(right_rows, columns=["k", "t", "v"]).sort_values("t", kind="stable")
    want = pd.merge_asof(
        lpd, rpd, on="t", by="k", direction="backward", allow_exact_matches=True
    ).sort_values("seq").reset_index(drop=True)

    for i in range(len(want)):
        g, w = got.iloc[i], want.iloc[i]
        assert (g["k"], g["t"], g["seq"]) == (w["k"], w["t"], w["seq"])
        if pd.isna(w["v"]):
            assert pd.isna(g["v"]), f"row {i}: got {g['v']}, want NaN"
        else:
            assert g["v"] == w["v"], f"row {i}: got {g['v']}, want {w['v']}"


def test_asof_join_tied_right_rows_deterministic(spark):
    """Two right rows sharing (key, time): backward picks the greatest value
    struct, forward the smallest — independent of partitioning."""
    from learn_hbase_spark.operators.joins import asof_join

    # left at the SAME instant as the tied rights: inclusive in both
    # directions, so backward and forward each have to break the tie
    left = spark.createDataFrame([("k", 5)], "id string, t int")
    right = spark.createDataFrame(
        [("k", 5, "a", 1), ("k", 5, "b", 2)],
        "id string, t int, val string, n int",
    )
    for parts in (1, 7):
        out = asof_join(
            left.repartition(parts),
            right.repartition(parts),
            on=["id"],
            left_time="t",
            right_time="t",
            value_cols=["val", "n"],
        ).collect()
        assert [(r["val"], r["n"]) for r in out] == [("b", 2)]
        fwd = asof_join(
            left.repartition(parts),
            right.repartition(parts),
            on=["id"],
            left_time="t",
            right_time="t",
            value_cols=["val", "n"],
            direction="forward",
        ).collect()
        assert [(r["val"], r["n"]) for r in fwd] == [("a", 1)]


def test_asof_join_matched_row_null_stays_null(spark):
    """A NULL inside the matched right row must come through as NULL, not
    fall back to an older row's value (per-column ignorenulls would)."""
    from learn_hbase_spark.operators.joins import asof_join

    left = spark.createDataFrame([("k", 10)], "id string, t int")
    right = spark.createDataFrame(
        [("k", 1, "old", 1), ("k", 5, None, 5)],
        "id string, t int, val string, n int",
    )
    out = asof_join(
        left, right, on=["id"], left_time="t", right_time="t",
        value_cols=["val", "n"],
    ).collect()
    assert [(r["val"], r["n"]) for r in out] == [(None, 5)]


def test_line_dedup_drops_hot_keeps_structure(spark):
    from learn_hbase_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "a\nBOIL\nb"),
            (2, "BOIL\nc\n \nd"),
            (3, "BOIL\ne"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
        for r in line_dedup(docs, max_count=2).collect()
    }
    # BOIL appears 3 times > 2 -> dropped everywhere; the whitespace-only
    # line in doc 2 is structural and survives; order is preserved.
    assert out[1] == ("a\nb", 2, 1)
    assert out[2] == ("c\n \nd", 3, 1)
    assert out[3] == ("e", 1, 1)


def test_morton2_interleaves_bits(spark):
    from learn_hbase_spark.functions.layout import morton2

    df = spark.createDataFrame(
        [(1, 0), (0, 1), (3, 5), (65535, 65535)], "a int, b int"
    )
    out = [
        r["z"]
        for r in df.select(
            morton2(F.col("a"), F.col("b")).alias("z")
        ).collect()
    ]
    # bit i of a -> position 2i; bit i of b -> 2i+1
    def ref(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert out == [ref(1, 0), ref(0, 1), ref(3, 5), ref(65535, 65535)]
    assert out[-1] == (1 << 32) - 1


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Storage proof for the Morton key: the same rows written (a) sorted
    by x only and (b) in z-order are queried with a 2-D box; row-group
    min/max stats must prune MORE of the z-ordered layout on the
    y-constrained box, and the z-layout must stay selective on x too."""
    import random

    from learn_hbase_spark.functions.layout import (
        candidate_row_groups,
        write_zordered,
    )

    rng = random.Random(7)
    rows = [(rng.randrange(4096), rng.randrange(4096)) for _ in range(40_000)]
    df = spark.createDataFrame(rows, "x int, y int")
    n_files = 16

    linear = str(tmp_path / "linear")
    (
        df.repartitionByRange(n_files, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zordered = str(tmp_path / "zorder")
    write_zordered(df, zordered, "x", "y", n_files=n_files)

    box_y = ((0, 4095), (100, 300))  # selective on y only
    lin_y, lin_total = candidate_row_groups(
        linear, "x", box_y[0], "y", box_y[1]
    )
    z_y, z_total = candidate_row_groups(
        zordered, "x", box_y[0], "y", box_y[1]
    )
    # linear-on-x clusters nothing about y: every row group is a candidate;
    # the z-layout must actually prune
    assert lin_y == lin_total
    assert z_y < z_total / 2

    box_xy = ((100, 300), (100, 300))  # selective on both
    lin_xy, _ = candidate_row_groups(linear, "x", box_xy[0], "y", box_xy[1])
    z_xy, _ = candidate_row_groups(zordered, "x", box_xy[0], "y", box_xy[1])
    assert z_xy < z_total / 2
    # and correctness: both layouts return identical query results
    want = sorted(
        map(tuple, df.filter("x between 100 and 300 and y between 100 and 300").collect())
    )
    got = sorted(
        map(
            tuple,
            spark.read.parquet(zordered)
            .filter("x between 100 and 300 and y between 100 and 300")
            .collect(),
        )
    )
    assert got == want


def test_expectations_single_pass_report(spark):
    from learn_hbase_spark.operators import expectations as X

    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, None, "A"), (4, 99.0, "C")],
        "id int, v double, cat string",
    )
    report = {
        r["rule"]: (r["n_satisfied"], r["passed"])
        for r in X.check(
            df,
            [
                X.not_null("v"),
                X.in_range("v", 0, 50),
                X.Expectation(
                    "v_mostly_present",
                    F.col("v").isNotNull(),
                    min_fraction=0.7,
                ),
                X.unique("id"),
                X.unique("cat"),
            ],
        ).collect()
    }
    assert report["v_not_null"] == (3, False)       # 1 null -> hard fail
    assert report["v_between_0_50"] == (2, False)   # 99 and null fail
    assert report["v_mostly_present"] == (3, True)  # 3/4 >= 0.7
    assert report["id_unique"] == (4, True)
    assert report["cat_unique"] == (3, False)       # A repeats


def test_expectations_validation(spark):
    from learn_hbase_spark.operators import expectations as X

    df = spark.createDataFrame([(1,)], "id int")
    # duplicate rule names are an error, not an ambiguous-column crash
    with pytest.raises(ValueError, match="duplicate"):
        X.check(df, [X.not_null("id"), X.not_null("id")])
    # uniqueness is an explicit kind, not a magic min_fraction: a renamed
    # unique rule keeps working, and min_fraction=-1.0 is just a fraction
    renamed = X.Expectation("pk", kind="unique", col="id")
    assert {r["rule"]: r["passed"] for r in X.check(df, [renamed]).collect()} == {
        "pk": True
    }
    with pytest.raises(ValueError, match="needs a condition"):
        X.Expectation("broken", min_fraction=-1.0)
    with pytest.raises(ValueError, match="unknown kind"):
        X.Expectation("broken", F.lit(True), kind="exotic")


# ---------------------------------------------------------------------------
# snapshot diff (operators.joins.snapshot_diff)
# ---------------------------------------------------------------------------


def test_snapshot_diff_classifies_all_change_types(spark):
    from learn_hbase_spark.operators.joins import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, name string, val double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (3, "c", 30.0), (5, "e", 50.0)],
        "k long, name string, val double",
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"], ["name", "val"]).collect()
    }
    assert got == {
        1: "unchanged",
        2: "modified",      # name case change
        3: "modified",      # NULL -> 30.0
        4: "deleted",
        5: "added",
    }


def test_snapshot_diff_null_vs_sentinel_string(spark):
    # the hash null-tags each column: a literal "\x00" value must NOT be
    # conflated with NULL (the naive coalesce-only hash would)
    from learn_hbase_spark.operators.joins import snapshot_diff

    old = spark.createDataFrame([(1, "\x00")], "k long, v string")
    new = spark.createDataFrame([(1, None)], "k long, v string")
    got = snapshot_diff(old, new, ["k"], ["v"]).collect()
    assert got[0]["change_type"] == "modified"

"""Chunking / SCD2 / mixture-sampling operator semantics (edge cases the
sf0.01 oracle can't isolate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from learn_hbase_spark.operators.chunking import chunk_words
from learn_hbase_spark.operators.sampling import mixture_sample
from learn_hbase_spark.operators.window import scd2


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_words_overlap_and_tail(spark):
    text = " ".join(f"w{i}" for i in range(10))
    out = chunk_words(
        _docs(spark, [(1, text)]), chunk_size=5, overlap=2
    ).orderBy("chunk_id").collect()
    # stride 3 over 10 words -> starts 1,4,7 (last window short)
    assert [(r.chunk_id, r.n_words) for r in out] == [(0, 5), (1, 5), (2, 4)]
    assert out[0].chunk_text.split(" ") == [f"w{i}" for i in range(5)]
    assert out[2].chunk_text.split(" ") == ["w6", "w7", "w8", "w9"]


def test_chunk_words_short_doc_single_chunk(spark):
    out = chunk_words(
        _docs(spark, [(1, "a b c")]), chunk_size=64, overlap=16
    ).collect()
    assert len(out) == 1 and out[0].n_words == 3 and out[0].chunk_id == 0


def test_chunk_words_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        chunk_words(_docs(spark, [(1, "x")]), chunk_size=4, overlap=4)


def test_scd2_collapses_runs_and_marks_current(spark):
    rows = [
        ("u1", 1, "A"), ("u1", 2, "A"), ("u1", 3, "B"),
        ("u1", 4, "B"), ("u1", 5, "A"),
        ("u2", 1, "X"),
    ]
    df = spark.createDataFrame(rows, "user string, seq int, state string")
    out = scd2(df, "user", "seq", "state", tiebreak="seq")
    got = {
        (r.user, r.valid_from): (r.state, r.valid_to, r.is_current)
        for r in out.collect()
    }
    assert got == {
        ("u1", 1): ("A", 3, False),
        ("u1", 3): ("B", 5, False),
        ("u1", 5): ("A", None, True),
        ("u2", 1): ("X", None, True),
    }


def test_scd2_null_values_collapse_null_safely(spark):
    rows = [("u1", 1, None), ("u1", 2, None), ("u1", 3, "A")]
    df = spark.createDataFrame(rows, "user string, seq int, state string")
    out = scd2(df, "user", "seq", "state", tiebreak="seq").collect()
    # two null rows are ONE interval (IS DISTINCT FROM semantics)
    assert len(out) == 2
    first = [r for r in out if r.valid_from == 1][0]
    assert first.state is None and first.valid_to == 3


def test_mixture_sample_hits_target_proportions(spark):
    # 3 strata x 2000 ids: large enough for hash noise < 5%
    base = spark.range(6000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("src"),
    )
    out = (
        mixture_sample(base, "doc_id", "src", {"s0": 0.5, "s1": 0.3, "s2": 0.2})
        .groupBy("src")
        .count()
        .collect()
    )
    counts = {r.src: r["count"] for r in out}
    # C = min(2000/0.5, 2000/0.3, 2000/0.2) = 4000 -> expect 2000/1200/800
    assert counts["s0"] == 2000  # rate 1.0 keeps the whole stratum
    assert abs(counts["s1"] - 1200) < 60
    assert abs(counts["s2"] - 800) < 40


def test_mixture_sample_drops_unlisted_strata(spark):
    base = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 50, "keep").otherwise("drop").alias("src"),
    )
    out = mixture_sample(base, "doc_id", "src", {"keep": 1.0})
    assert out.filter(F.col("src") == "drop").count() == 0

"""Sequence packing, PII redaction, repetition scoring, stratified sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from learn_hbase_spark.functions import text as T
from learn_hbase_spark.operators import sampling
from learn_hbase_spark.operators.packing import pack_sequences


def test_pack_sequences_cuts_at_budget(spark):
    # one group: force every id into the same stream via group_chars=0
    df = spark.createDataFrame(
        [(i, 10) for i in range(10)], "doc_id long, n int"
    )
    out = pack_sequences(df, "doc_id", F.col("n"), budget=25, group_chars=0)
    got = {r["doc_id"]: r["seq_id"] for r in out.collect()}
    # cumulative-before: 0,10,20,30,... → floor(/25): 0,0,0,1,1,2,2,2,3,3
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 2, 8: 3, 9: 3}


def test_pack_sequences_oversized_doc_gets_own_bins(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 5), (3, 5)], "doc_id long, n int"
    )
    out = pack_sequences(df, "doc_id", F.col("n"), budget=10, group_chars=0)
    got = {r["doc_id"]: r["seq_id"] for r in out.collect()}
    assert got[1] == 0 and got[2] == 10 and got[3] == 10


@pytest.mark.parametrize(
    "raw, want",
    [
        ("mail me at jo.doe+x@corp.example.org now", "mail me at <EMAIL> now"),
        ("call +1 (415) 555-0199 today", "call <PHONE> today"),
        ("a@b.co and 0123456789", "<EMAIL> and <PHONE>"),
        ("no pii here", "no pii here"),
    ],
)
def test_redact_pii(spark, raw, want):
    df = spark.createDataFrame([(raw,)], "t string")
    assert df.select(T.redact_pii(F.col("t")).alias("r")).first()["r"] == want


def test_pii_counts(spark):
    df = spark.createDataFrame(
        [("a@b.co c@d.org and +12345678901",)], "t string"
    )
    e, p = T.pii_counts(F.col("t"))
    row = df.select(e.alias("e"), p.alias("p")).first()
    assert (row["e"], row["p"]) == (2, 1)


def test_repetition_score(spark):
    rows = [
        ("a b a b a b", 3 / 5),  # 5 bigrams, 2 distinct → 1 - 2/5
        ("all words unique here", 0.0),
        ("one", 0.0),  # fewer than n tokens
        ("", 0.0),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "t string")
    got = [
        r["s"]
        for r in df.select(T.repetition_score(F.col("t")).alias("s")).collect()
    ]
    for (_, want), g in zip(rows, got):
        assert abs(g - want) < 1e-9


def test_stratified_sample_rates(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = sampling.stratified_sample(
        df, "doc_id", "src", {"a": 1.0, "b": 0.2}
    )
    counts = {
        r["src"]: r["n"]
        for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert counts["a"] == 1000  # rate 1.0 keeps everything
    assert abs(counts["b"] / 1000 - 0.2) < 0.04


def test_threshold_full_rate_sentinel():
    assert sampling.threshold(1.0) == "g"
    assert sampling.threshold(0.5) == "8000"
    assert "ffff" < "g"  # the property the sentinel relies on

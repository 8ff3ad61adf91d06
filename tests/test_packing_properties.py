"""Property-based invariants for sequence packing (hypothesis-driven)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from learn_hbase_spark.operators.packing import pack_sequences


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=30),
    budget=st.integers(min_value=1, max_value=60),
)
def test_pack_bins_are_contiguous_and_budgeted(spark, counts, budget):
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(counts)], "doc_id long, n int"
    )
    rows = sorted(
        pack_sequences(df, "doc_id", F.col("n"), budget, group_chars=0).join(
            df, "doc_id"
        ).collect(),
        key=lambda r: r["doc_id"],
    )
    # bins form contiguous, nondecreasing runs over the stream order
    seqs = [r["seq_id"] for r in rows]
    assert seqs == sorted(seqs)
    assert seqs[0] == 0
    # every bin's token total, minus its last member, stays under budget:
    # a doc only opens a new bin once the previous one is full
    from collections import defaultdict

    bins = defaultdict(list)
    for r in rows:
        bins[r["seq_id"]].append(r["n"])
    for members in bins.values():
        assert sum(members[:-1]) < budget
    # conservation: every doc packed exactly once
    assert len(rows) == len(counts)

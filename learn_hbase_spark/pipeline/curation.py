"""End-to-end training-data curation pipeline — the LLM-era analog of the
reference's 3-stage meter pipeline (``pipeline/rdl.py``): several operators
composed into ONE declarative lineage that Catalyst plans as a whole.

Stages (each is an operator from this library, each individually oracled):

1. quality gate     — drop docs under a minimum token count
2. exact dedup      — first-wins by content fingerprint (min doc_id)
3. decontamination  — drop docs sharing 3-grams with the held-out set
4. mixture sampling — per-source keep rates (salted identity hash)
5. sequence packing — token-budget bins in hash-sharded streams

Scale posture: stages 1, 3 (probe side), and 4 are projection+filter and
fuse into the scan; the only corpus-wide shuffles are the dedup digest
aggregation and the final packing window — both carry key-sized rows, never
bodies, until the surviving ids are semi-joined back. Composing lazily (no
materialization between stages) lets Catalyst push the cheap filters below
the expensive joins where legal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators import dedup, packing, sampling


def curate(
    docs: DataFrame,
    benchmark: DataFrame,
    min_tokens: int = 5,
    rates: dict[str, float] | None = None,
    default_rate: float = 0.1,
    budget: int = 64,
    token_count: Column | None = None,
) -> DataFrame:
    """Run the 5-stage curation pipeline; returns packed training rows
    ``(doc_id, pack_group, seq_id)`` for the surviving documents."""
    tokens = token_count if token_count is not None else T.token_count(F.col("text"))

    gated = docs.filter(tokens >= min_tokens)
    survivors = dedup.exact_dedup(gated, "text", "doc_id")
    clean_ids = (
        dedup.decontaminate(survivors, benchmark, "text", "doc_id", n=3)
        .filter(~F.col("contaminated"))
        .select("doc_id")
    )
    clean = survivors.join(clean_ids, "doc_id", "left_semi")
    mixed = sampling.stratified_sample(
        clean, "doc_id", "source", rates or {}, default=default_rate
    )
    return packing.pack_sequences(mixed, "doc_id", tokens, budget=budget)


def audit(
    docs: DataFrame,
    benchmark: DataFrame,
    min_tokens: int = 5,
    rates: dict[str, float] | None = None,
    default_rate: float = 0.1,
    token_count: Column | None = None,
) -> DataFrame:
    """Per-document curation verdict — the debuggability complement to
    :func:`curate`: every doc gets the FIRST stage that dropped it
    (``short`` → ``duplicate`` → ``contaminated`` → ``sampled_out``) or
    ``kept``. Stage decisions are the same operator expressions the
    pipeline runs (dedup winners, decontamination flags,
    ``sampling.stratified_keep_expr``), so the audit can never disagree
    with the pipeline. Two narrow left joins on doc_id (winner set,
    contaminated set — both key-only frames); everything else is
    projection."""
    tokens = token_count if token_count is not None else T.token_count(F.col("text"))
    base = docs.select("doc_id", "text", "source", tokens.alias("_n"))
    gated = base.filter(F.col("_n") >= min_tokens)
    winners = dedup.exact_fingerprints(gated, "text", "doc_id").select(
        "doc_id", F.lit(True).alias("_win")
    )
    survivors = gated.join(winners.select("doc_id"), "doc_id", "left_semi")
    cont = (
        dedup.decontaminate(survivors, benchmark, "text", "doc_id", n=3)
        .filter(F.col("contaminated"))
        .select("doc_id", F.lit(True).alias("_cont"))
    )
    keep = sampling.stratified_keep_expr(
        "doc_id", "source", rates or {}, default_rate
    )
    return (
        base.join(winners, "doc_id", "left")
        .join(cont, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_n") < min_tokens, "short")
            .when(F.col("_win").isNull(), "duplicate")
            .when(F.col("_cont").isNotNull(), "contaminated")
            .when(~keep, "sampled_out")
            .otherwise("kept")
            .alias("verdict"),
        )
    )

"""End-to-end training-data curation pipeline — the LLM-era analog of the
reference's 3-stage meter pipeline (``pipeline/rdl.py``): several operators
composed into ONE declarative lineage that Catalyst plans as a whole.

Stages (each is an operator from this library, each individually oracled):

1. quality gate     — drop docs under a minimum token count
2. exact dedup      — first-wins by content fingerprint (min doc_id)
3. decontamination  — drop docs sharing 3-grams with the held-out set
4. LM quality band  — optional: drop docs under a bigram-LM score
                      percentile (the CCNet recipe, Wenzek 2020: filter
                      on model score BEFORE mixing)
5. mixture sampling — per-source keep rates (salted identity hash)
6. sequence packing — token-budget bins in hash-sharded streams

Scale posture: stages 1, 3 (probe side), and 5 are projection+filter and
fuse into the scan; the corpus-wide shuffles are the dedup digest
aggregation, the (optional) bigram count/score shuffles — Zipf-truncated
(token-pair, count) rows, never bodies — and the final packing window.
The LM threshold is an exact interpolated percentile computed by
AGGREGATION and broadcast back as a one-row frame, deliberately not a
global rank window (which would serialize 100 TB into one task).
Composing lazily (no materialization between stages) lets Catalyst push
the cheap filters below the expensive joins where legal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators import dedup, packing, sampling
from ..operators.corpus import bigram_lm_score


def _require_scoreable(min_tokens: int, lm_quantile: float | None) -> None:
    """The LM band keeps documents via a left_semi against the scored set,
    and ``bigram_lm_score`` emits no row for a doc with zero bigrams — so
    with ``min_tokens <= 1`` a one-token doc would be silently dropped as
    ``low_quality`` despite never having been scored. Refuse that
    configuration up front instead of mislabeling."""
    if lm_quantile is not None and min_tokens < 2:
        raise ValueError(
            "lm_quantile requires min_tokens >= 2: the bigram-LM band can "
            f"only judge documents with at least one bigram (got "
            f"min_tokens={min_tokens})"
        )


def _lm_band_ids(
    clean: DataFrame, lm_quantile: float, approx_threshold: bool = False
) -> DataFrame:
    """Key-only frame of documents at or above the ``lm_quantile``
    percentile of the corpus's own bigram-LM score — the CCNet-style
    quality band (score the corpus under a model trained on itself, drop
    the low tail). Round-6 scores compared to a round-4 threshold so an
    external oracle makes identical keep/drop calls (same posture as
    ``quality_band_sample``). Every doc reaching this stage has passed
    the token gate, and the gate guarantees >= 2 tokens (enforced by
    :func:`_require_scoreable`), so every doc has at least one bigram and
    therefore a score — the left_semi below never drops an unscored doc.

    The default exact ``percentile`` buffers a (value -> count) map:
    final-task memory is O(distinct scores), bounded because
    ``bigram_lm_score`` rounds to 6 before this aggregate — not by row
    count (SCALE.md "Exact-percentile thresholds").
    ``approx_threshold=True`` swaps in ``approx_percentile`` (fixed
    sketch state) for production corpora with a very wide score span."""
    scored = bigram_lm_score(clean, "text", "doc_id").select(
        "doc_id", F.col("avg_logprob").alias("_lm")
    )
    fn = "approx_percentile" if approx_threshold else "percentile"
    lo = scored.agg(
        F.round(F.expr(f"{fn}(_lm, {lm_quantile})"), 4).alias("_lo")
    )
    return (
        scored.crossJoin(F.broadcast(lo))
        .filter(F.col("_lm") >= F.col("_lo"))
        .select("doc_id")
    )


def curate(
    docs: DataFrame,
    benchmark: DataFrame,
    min_tokens: int = 5,
    rates: dict[str, float] | None = None,
    default_rate: float = 0.1,
    budget: int = 64,
    token_count: Column | None = None,
    lm_quantile: float | None = None,
    approx_threshold: bool = False,
) -> DataFrame:
    """Run the curation pipeline; returns packed training rows
    ``(doc_id, pack_group, seq_id)`` for the surviving documents.
    ``lm_quantile`` (e.g. 0.10) enables the bigram-LM quality band:
    documents scoring under that percentile of the post-decontamination
    corpus are dropped before mixing (requires ``min_tokens >= 2`` so
    every banded document is scoreable). ``approx_threshold`` switches
    the band threshold to ``approx_percentile`` — fixed sketch memory
    instead of the exact path's O(distinct rounded scores) state."""
    _require_scoreable(min_tokens, lm_quantile)
    tokens = token_count if token_count is not None else T.token_count(F.col("text"))

    gated = docs.filter(tokens >= min_tokens)
    survivors = dedup.exact_dedup(gated, "text", "doc_id")
    clean_ids = (
        dedup.decontaminate(survivors, benchmark, "text", "doc_id", n=3)
        .filter(~F.col("contaminated"))
        .select("doc_id")
    )
    clean = survivors.join(clean_ids, "doc_id", "left_semi")
    if lm_quantile is not None:
        clean = clean.join(
            _lm_band_ids(clean, lm_quantile, approx_threshold),
            "doc_id",
            "left_semi",
        )
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
    lm_quantile: float | None = None,
    approx_threshold: bool = False,
) -> DataFrame:
    """Per-document curation verdict — the debuggability complement to
    :func:`curate`: every doc gets the FIRST stage that dropped it
    (``short`` → ``duplicate`` → ``contaminated`` → ``low_quality`` →
    ``sampled_out``) or ``kept``. Stage decisions are the same operator
    expressions the pipeline runs (dedup winners, decontamination flags,
    the :func:`_lm_band_ids` threshold, ``sampling.stratified_keep_expr``),
    so the audit can never disagree with the pipeline. Narrow left joins
    on doc_id (winner set, contaminated set, band set — all key-only
    frames); everything else is projection. ``low_quality`` appears only
    when ``lm_quantile`` is set, mirroring :func:`curate` (including its
    ``min_tokens >= 2`` requirement)."""
    _require_scoreable(min_tokens, lm_quantile)
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
    out = base.join(winners, "doc_id", "left").join(cont, "doc_id", "left")
    verdict = (
        F.when(F.col("_n") < min_tokens, "short")
        .when(F.col("_win").isNull(), "duplicate")
        .when(F.col("_cont").isNotNull(), "contaminated")
    )
    if lm_quantile is not None:
        # score the SAME corpus the pipeline scores: post-decontamination
        # survivors (the model is trained on the set it filters, so the
        # threshold matches curate()'s bit for bit)
        clean = survivors.join(cont.select("doc_id"), "doc_id", "left_anti")
        band = _lm_band_ids(clean, lm_quantile, approx_threshold).select(
            "doc_id", F.lit(True).alias("_band")
        )
        out = out.join(band, "doc_id", "left")
        verdict = verdict.when(F.col("_band").isNull(), "low_quality")
    keep = sampling.stratified_keep_expr(
        "doc_id", "source", rates or {}, default_rate
    )
    return out.select(
        "doc_id",
        verdict.when(~keep, "sampled_out").otherwise("kept").alias("verdict"),
    )

"""End-to-end training-data curation pipeline — the LLM-era analog of the
reference's 3-stage meter pipeline (``pipeline/rdl.py``): several operators
composed into ONE declarative lineage that Catalyst plans as a whole (the
reference analogue: every stage of ``RdlETL2.java:34-141`` composes into a
single pass).

Stages (each is an operator from this library, each individually oracled;
every stage between the scan and packing is optional and independently
switchable):

1. C4 line cleaning   — optional: rewrite each page keeping only terminal-
                        punctuated lines with enough words; drop pages with
                        lorem-ipsum/brace tells or too few surviving lines
                        (Raffel 2020 §2.2). Runs FIRST because later stages
                        must judge the text that will actually be trained on.
2. quality gate       — drop docs under a minimum token count
3. Gopher quality     — optional: the seven rule-based document filters of
                        Rae 2021 §A1.1 (word count, mean word length,
                        symbol/bullet/ellipsis ratios, alpha fraction,
                        stopwords)
4. Gopher repetition  — optional: top-n-gram and duplicated-n-gram character
                        fractions (Rae 2021 Table A1), width-selectable
5. exact dedup        — first-wins by content fingerprint (min doc_id)
6. decontamination    — drop docs sharing 3-grams with the held-out set
7. LM quality band    — optional: drop docs under a bigram-LM score
                        percentile (the CCNet recipe, Wenzek 2020: filter
                        on model score BEFORE mixing)
8. CCNet buckets      — optional: bucket docs against their own stratum's
                        LM-score tertiles and keep only the configured
                        buckets (Wenzek 2020 §4.3 head/middle/tail)
9. mixture sampling   — per-source keep rates (salted identity hash)
10. sequence packing  — token-budget bins in hash-sharded streams

Scale posture: stages 1-3 are projection+filter and fuse into the scan
(no join — the rule operators pass working columns through their own
projection); stage 4's shuffle carries hashed int gram rows sized by the
selected widths; the corpus-wide shuffles are the dedup digest
aggregation, the (optional) bigram count/score shuffles — Zipf-truncated
(token-pair, count) rows, never bodies — and the final packing window.
LM thresholds (band percentile, per-stratum tertiles) are exact
interpolated percentiles computed by AGGREGATION and broadcast back as
tiny frames, deliberately not global rank windows (which would serialize
100 TB into one task). Composing lazily (no materialization between
stages) lets Catalyst push the cheap filters below the expensive joins
where legal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.layout import rebalance_for_compute
from ..operators import corpus as corpus_rules
from ..operators import dedup, packing, sampling
from ..operators.corpus import bigram_lm_score, perplexity_buckets
from ..operators.corpus import gopher_repetition_flags as _gopher_rep

#: pipeline stage order — the audit's verdict precedence and the pytest's
#: pinned contract. A document's verdict is the FIRST stage that dropped it.
STAGE_ORDER = (
    "c4_dropped",      # stage 1: C4 page drop (rewrite happens here too)
    "short",           # stage 2: token-count gate
    "gopher_quality",  # stage 3: Gopher rule-based quality filter
    "gopher_repetition",  # stage 4: Gopher repetition filter
    "duplicate",       # stage 5: exact dedup, first-wins
    "contaminated",    # stage 6: benchmark decontamination
    "low_quality",     # stage 7: bigram-LM percentile band
    "ppl_tail",        # stage 8: CCNet bucket keep-set
    "sampled_out",     # stage 9: mixture sampling
    "kept",
)


def _pin(df: DataFrame) -> DataFrame:
    """Materialize a frame the pipeline consumes more than once.
    Catalyst's exchange reuse only deduplicates IDENTICAL subplans, and
    the band stages reference their inputs under different column
    prunings — so without pinning, the whole upstream lineage (C4 + rule
    gates + the repetition shuffle + dedup + decontamination) re-executes
    once per consumer (measured: 26.7 s → 13 s at sf0.1 for the
    rules-composed pipeline).

    ``localCheckpoint`` rather than ``persist`` (r16, measured — guide
    §5 "very large query plans" / §7.3): a persist keeps the FULL
    analyzed lineage in every downstream plan, so each of the pipeline's
    10-15 downstream actions re-pays optimizer + CacheManager
    canonicalization over the entire curation tree — plan-size cost, not
    data cost (interleaved A/B at sf0.1: curation_pipeline_rules
    7.4-8.4 s persisted vs 3.7-3.9 s checkpointed, identical rows). The
    checkpoint truncates the plan at the stage seam — the same seam
    where a production pipeline checkpoints the curated corpus to
    DURABLE storage between the gate phase and the model-scoring phase
    (a driver/executor loss there re-runs the stage from the durable
    copy; local checkpoint state trades that recovery for speed, the
    documented localCheckpoint contract). Storage is MEMORY_AND_DISK
    like the old persist, and checkpointed partitions are
    ContextCleaner-collected with the frame (the CacheManager held
    persisted plans strongly until session end). Repeated small-batch
    callers still opt out — the streaming micro-batch path passes
    ``pin=False`` to the band helpers so a long-running stream does not
    accumulate per-drain pinned state."""
    return df.localCheckpoint()


def _require_scoreable(
    min_tokens: int,
    lm_quantile: float | None,
    ccnet_keep: tuple[str, ...] | None = None,
) -> None:
    """The LM band and the CCNet buckets keep documents via a left_semi
    against the scored set, and ``bigram_lm_score`` emits no row for a doc
    with zero bigrams — so with ``min_tokens <= 1`` a one-token doc would
    be silently dropped as ``low_quality``/``ppl_tail`` despite never
    having been scored. Refuse that configuration up front instead of
    mislabeling."""
    if (lm_quantile is not None or ccnet_keep is not None) and min_tokens < 2:
        raise ValueError(
            "lm_quantile / ccnet_keep require min_tokens >= 2: the "
            "bigram-LM stages can only judge documents with at least one "
            f"bigram (got min_tokens={min_tokens})"
        )


def _lm_band_ids(
    clean: DataFrame,
    lm_quantile: float,
    approx_threshold: bool = False,
    pin: bool = True,
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
    sketch state) for production corpora with a very wide score span.
    ``pin=False`` skips the scored-frame persist — for repeated callers
    (the streaming micro-batch path) where per-call cache entries would
    accumulate pinned state per drain (see :func:`_pin`)."""
    scored = bigram_lm_score(clean, "text", "doc_id").select(
        "doc_id", F.col("avg_logprob").alias("_lm")
    )
    if pin:
        scored = _pin(scored)
    fn = "approx_percentile" if approx_threshold else "percentile"
    lo = scored.agg(
        F.round(F.expr(f"{fn}(_lm, {lm_quantile})"), 4).alias("_lo")
    )
    return (
        scored.crossJoin(F.broadcast(lo))
        .filter(F.col("_lm") >= F.col("_lo"))
        .select("doc_id")
    )


def _ccnet_band_ids(
    clean: DataFrame,
    ccnet_keep: tuple[str, ...],
    strata_col: str = "source",
    approx_threshold: bool = False,
    pin: bool = True,
) -> DataFrame:
    """Key-only frame of documents whose CCNet bucket (per-stratum
    tertiles of the corpus's own bigram-LM score, Wenzek 2020 §4.3) is in
    ``ccnet_keep`` — e.g. ``("head", "middle")`` drops each stratum's
    worst third. Same self-trained-model posture and round-6/round-4
    parity rules as :func:`_lm_band_ids`; thresholds are per-stratum
    exact percentiles (|strata| rows, broadcast back), or
    ``approx_percentile`` sketches per stratum under
    ``approx_threshold`` — the same production switch as the LM band.
    ``pin=False`` skips the scored-frame persist for callers that invoke
    this repeatedly in one session (see :func:`_pin` on pin lifetime)."""
    scored = bigram_lm_score(clean, "text", "doc_id").select(
        "doc_id", F.col("avg_logprob").alias("_lm")
    )
    with_src = scored.join(clean.select("doc_id", strata_col), "doc_id")
    if pin:
        with_src = _pin(with_src)
    bucketed = perplexity_buckets(
        with_src, "doc_id", "_lm", strata_col,
        approx_threshold=approx_threshold,
    )
    return bucketed.filter(
        F.col("ppl_bucket").isin(*ccnet_keep)
    ).select("doc_id")


def _apply_rule_gates(
    work: DataFrame,
    min_tokens: int,
    tokens: Column,
    c4_clean: bool,
    c4_kwargs: dict | None,
    gopher_quality: bool,
    gopher_quality_kwargs: dict | None,
    gopher_repetition: bool,
    gopher_repetition_kwargs: dict | None,
) -> DataFrame:
    """Stages 1-4 of :data:`STAGE_ORDER` as :func:`curate` runs them.
    :func:`audit` mirrors these stages with flag columns instead of
    filters (it must emit a verdict for DROPPED docs too) — the two
    bodies are kept in lockstep by the stage-order pytest, which pins
    per-stage curate/audit agreement on a corpus crafted to drop one doc
    at every stage. C4 rewrites ``text`` IN PLACE (downstream stages — token gate, rule
    filters, dedup, LM scoring, packing — all judge the cleaned text, the
    text that would actually be trained on); the Gopher gates are
    projection-fused filters (quality) or a key-only semi-join
    (repetition, whose metric aggregation shuffles regardless).

    The gate phase is projection-fused into the scan stage, so on a
    small/single-split input it would run on ONE task — rebalance first
    (conditional: a no-op when the scan is already well-split)."""
    work = rebalance_for_compute(work, "doc_id")
    if c4_clean:
        others = [c for c in work.columns if c not in ("doc_id", "text")]
        work = (
            T.c4_line_clean(
                work, "text", "doc_id",
                passthrough=tuple(others), **(c4_kwargs or {}),
            )
            .filter("keep")
            .select("doc_id", F.col("clean_text").alias("text"), *others)
        )
    gated = work.filter(tokens >= min_tokens)
    if gopher_quality:
        others = [c for c in gated.columns if c != "doc_id"]
        gated = (
            T.gopher_quality_flags(
                gated, "text", "doc_id",
                passthrough=tuple(others), **(gopher_quality_kwargs or {}),
            )
            .filter("pass")
            .select("doc_id", *others)
        )
    if gopher_repetition:
        rep_ok = (
            _gopher_rep(
                gated, "text", "doc_id", **(gopher_repetition_kwargs or {})
            )
            .filter("pass")
            .select("doc_id")
        )
        gated = gated.join(rep_ok, "doc_id", "left_semi")
    return gated


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
    c4_clean: bool = False,
    c4_kwargs: dict | None = None,
    gopher_quality: bool = False,
    gopher_quality_kwargs: dict | None = None,
    gopher_repetition: bool = False,
    gopher_repetition_kwargs: dict | None = None,
    ccnet_keep: tuple[str, ...] | None = None,
    strata_col: str = "source",
) -> DataFrame:
    """Run the curation pipeline; returns packed training rows
    ``(doc_id, pack_group, seq_id)`` for the surviving documents.
    Optional stages (see module docstring for the full order):

    - ``c4_clean`` rewrites pages line-by-line and drops boilerplate
      pages BEFORE everything else (``c4_kwargs`` forwards to
      ``functions.text.c4_line_clean``, e.g. ``min_lines``).
    - ``gopher_quality`` / ``gopher_repetition`` gate on the Gopher rule
      sets after the token gate (kwargs dicts forward thresholds /
      ``widths`` — a production run samples repetition widths, e.g.
      ``{"widths": (2, 3, 4, 9)}``).
    - ``lm_quantile`` (e.g. 0.10) enables the bigram-LM quality band:
      documents scoring under that percentile of the
      post-decontamination corpus are dropped before mixing.
    - ``ccnet_keep`` (e.g. ``("head", "middle")``) enables the CCNet
      per-stratum tertile buckets and keeps only the listed buckets.
      Both LM stages require ``min_tokens >= 2`` so every banded
      document is scoreable. ``approx_threshold`` switches the band
      threshold to ``approx_percentile`` — fixed sketch memory instead
      of the exact path's O(distinct rounded scores) state."""
    _require_scoreable(min_tokens, lm_quantile, ccnet_keep)
    tokens = token_count if token_count is not None else T.token_count(F.col("text"))

    gated = _apply_rule_gates(
        docs, min_tokens, tokens,
        c4_clean, c4_kwargs,
        gopher_quality, gopher_quality_kwargs,
        gopher_repetition, gopher_repetition_kwargs,
    )
    return _curate_tail(
        gated, benchmark, tokens, rates, default_rate, budget,
        lm_quantile, approx_threshold, ccnet_keep, strata_col,
        pin_gated=gopher_repetition,
    )


def _curate_tail(
    gated: DataFrame,
    benchmark: DataFrame,
    tokens: Column,
    rates: dict[str, float] | None,
    default_rate: float,
    budget: int,
    lm_quantile: float | None,
    approx_threshold: bool,
    ccnet_keep: tuple[str, ...] | None,
    strata_col: str,
    pin_gated: bool,
    pin: bool = True,
) -> DataFrame:
    """Stages 5-10 (dedup → decontamination → LM band → CCNet buckets →
    mixing → packing) over an already-gated corpus — shared verbatim by
    :func:`curate` (which derives the gate from the rule operators
    inline) and :func:`curate_from_signals` (which derives it by
    thresholding a published signals table), so the two paths cannot
    drift. ``pin=False`` disables every stage-seam persist (including
    the band stages\' internal scored-frame pins) for repeated callers —
    see :func:`_pin` on pin lifetime."""
    mixed = _curate_survivors(
        gated, benchmark, rates, default_rate,
        lm_quantile, approx_threshold, ccnet_keep, strata_col,
        pin_gated, pin,
    )
    return packing.pack_sequences(mixed, "doc_id", tokens, budget=budget)


def _curate_survivors(
    gated: DataFrame,
    benchmark: DataFrame,
    rates: dict[str, float] | None,
    default_rate: float,
    lm_quantile: float | None,
    approx_threshold: bool,
    ccnet_keep: tuple[str, ...] | None,
    strata_col: str,
    pin_gated: bool,
    pin: bool = True,
) -> DataFrame:
    """Stages 5-9 (everything in :func:`_curate_tail` but the final
    packing): the curated surviving DOCUMENT frame, exposed so
    compositions that chain further corpus-level stages before packing
    (near-dup dedup, chunking, tokenization — the ``pretraining_run``
    lineage) build on exactly the pipeline's own survivor set."""
    if pin_gated and pin:
        # the gate output feeds several downstream consumers (dedup's
        # winner join, decontamination, the band stages) under different
        # prunings — pin it so the gate phase (or the signals semi-join)
        # runs once
        gated = _pin(gated)
    survivors = dedup.exact_dedup(gated, "text", "doc_id")
    clean_ids = (
        dedup.decontaminate(survivors, benchmark, "text", "doc_id", n=3)
        .filter(~F.col("contaminated"))
        .select("doc_id")
    )
    clean = survivors.join(clean_ids, "doc_id", "left_semi")
    if (lm_quantile is not None or ccnet_keep is not None) and pin:
        # the band stages reference clean several times (model training,
        # scoring, threshold, keep-join) — pin it so the gate phase runs once
        clean = _pin(clean)
    if lm_quantile is not None:
        clean = clean.join(
            _lm_band_ids(clean, lm_quantile, approx_threshold, pin=pin),
            "doc_id",
            "left_semi",
        )
    if ccnet_keep is not None:
        clean = clean.join(
            _ccnet_band_ids(
                clean, ccnet_keep, strata_col, approx_threshold, pin=pin
            ),
            "doc_id",
            "left_semi",
        )
    return sampling.stratified_sample(
        clean, "doc_id", "source", rates or {}, default=default_rate
    )


def curate_docs(
    docs: DataFrame,
    benchmark: DataFrame,
    min_tokens: int = 5,
    rates: dict[str, float] | None = None,
    default_rate: float = 0.1,
    token_count: Column | None = None,
    lm_quantile: float | None = None,
    approx_threshold: bool = False,
    c4_clean: bool = False,
    c4_kwargs: dict | None = None,
    gopher_quality: bool = False,
    gopher_quality_kwargs: dict | None = None,
    gopher_repetition: bool = False,
    gopher_repetition_kwargs: dict | None = None,
    ccnet_keep: tuple[str, ...] | None = None,
    strata_col: str = "source",
) -> DataFrame:
    """:func:`curate` minus the final packing: the curated surviving
    DOCUMENTS (cleaned text, post-mixing) — the frame a pretraining data
    path hands to its NEXT corpus-level stages (near-dup dedup, chunking,
    tokenization) before any packing happens. Same parameters and same
    stage bodies as :func:`curate` (:func:`_apply_rule_gates` +
    :func:`_curate_survivors` are shared verbatim), so a composition
    built on this can never drift from the pipeline's own survivor
    set."""
    _require_scoreable(min_tokens, lm_quantile, ccnet_keep)
    tokens = (
        token_count if token_count is not None else T.token_count(F.col("text"))
    )
    gated = _apply_rule_gates(
        docs, min_tokens, tokens,
        c4_clean, c4_kwargs,
        gopher_quality, gopher_quality_kwargs,
        gopher_repetition, gopher_repetition_kwargs,
    )
    return _curate_survivors(
        gated, benchmark, rates, default_rate,
        lm_quantile, approx_threshold, ccnet_keep, strata_col,
        pin_gated=gopher_repetition,
    )


def rule_signals(
    docs: DataFrame,
    c4_clean: bool = False,
    c4_kwargs: dict | None = None,
    widths: tuple[int, ...] = (2, 3, 4, 5, 6, 7, 8, 9, 10),
    token_count: Column | None = None,
    strata_col: str = "source",
) -> DataFrame:
    """Phase 1 of the two-phase curation shape real data teams run: the
    per-document RULE SIGNALS table, computed ONCE and published next to
    the corpus (the RedPajama-v2 artifact pattern) so downstream
    threshold iteration never re-pays the metric computation — in
    particular the repetition stage's gram shuffle, the only shuffle in
    the rule surface. One wide row per document: the C4 page-keep
    verdict (over the REWRITTEN text when ``c4_clean``, the text that
    would be trained on — all other signals judge that same text), the
    whitespace token count, the seven Gopher quality METRICS (no
    verdicts — thresholds are downstream decisions, which is the entire
    point of publishing signals), and the repetition character fractions
    at the selected ``widths``. The default widths are the Gopher
    operators' own full set, so a default-built table satisfies
    :func:`curate_from_signals` under ITS defaults; narrow ``widths``
    (e.g. the production-sampled ``(2, 3, 4, 9)``) only together with a
    matching ``gopher_repetition_kwargs`` downstream — the consumer
    validates column coverage and names any gap.

    Scale: the C4 rewrite and quality metrics are projection-fused map
    stages; the repetition metrics shuffle hashed int gram rows once;
    the final assembly is one doc_id join with no fan-out. The output is
    what a production run writes to parquet partitioned by corpus shard;
    :func:`curate_from_signals` is its consumer."""
    if c4_clean:
        base = T.c4_line_clean(
            docs, "text", "doc_id",
            passthrough=(strata_col,), **(c4_kwargs or {}),
        ).select(
            "doc_id",
            F.col("clean_text").alias("text"),
            strata_col,
            F.col("keep").alias("c4_keep"),
        )
    else:
        base = docs.select(
            "doc_id", "text", strata_col, F.lit(True).alias("c4_keep")
        )
    tokens = (
        token_count if token_count is not None else T.token_count(F.col("text"))
    )
    base = rebalance_for_compute(base.withColumn("n_tokens", tokens), "doc_id")
    metrics = T.gopher_quality_flags(
        base, "text", "doc_id",
        passthrough=(strata_col, "c4_keep", "n_tokens"),
    ).select(
        "doc_id", strata_col, "c4_keep", "n_tokens",
        "n_words", "mean_word_len", "symbol_ratio", "bullet_frac",
        "ellipsis_frac", "alpha_word_frac", "n_stopwords",
    )
    widths = tuple(sorted(set(widths)))
    rep = _gopher_rep(base, "text", "doc_id", widths=widths).select(
        "doc_id",
        *[f"top{n}_char_frac" for n in widths if n <= 4],
        *[f"dup{n}_char_frac" for n in widths if n >= 5],
    )
    return metrics.join(rep, "doc_id")


def _signal_rule_flags(
    signals_columns,
    c4_clean: bool,
    gopher_quality: bool,
    gopher_quality_kwargs: dict | None,
    gopher_repetition: bool,
    gopher_repetition_kwargs: dict | None,
) -> dict[str, Column]:
    """The rule-stage flags as boolean expressions over a published
    :func:`rule_signals` table's columns — the single thresholding
    implementation shared by :func:`curate_from_signals` (which conjoins
    them into one gate) and :func:`audit_from_signals` (which needs each
    stage's flag separately for the verdict precedence). The threshold
    expressions are the SAME rule conjunctions the inline flag operators
    apply (``functions.text.gopher_quality_rules``,
    ``operators.corpus.repetition_rules``) over metrics those operators
    rounded before publishing, so the signals path cannot drift from the
    inline path. Validates column coverage up front and names any gap
    (a table built with narrower repetition ``widths`` than the
    requested thresholds read)."""
    flags: dict[str, Column] = {
        "_c4": F.col("c4_keep") if c4_clean else F.lit(True),
        "_gq": F.lit(True),
        "_gr": F.lit(True),
    }
    needed = {"doc_id", "n_tokens"}
    if c4_clean:
        needed.add("c4_keep")
    if gopher_quality:
        for rule in T.gopher_quality_rules(
            **(gopher_quality_kwargs or {})
        ).values():
            flags["_gq"] = flags["_gq"] & rule
        needed.update(
            ("n_words", "mean_word_len", "symbol_ratio", "bullet_frac",
             "ellipsis_frac", "alpha_word_frac", "n_stopwords")
        )
    if gopher_repetition:
        rep_rules = corpus_rules.repetition_rules(
            **(gopher_repetition_kwargs or {})
        )
        for rule in rep_rules.values():
            flags["_gr"] = flags["_gr"] & rule
        needed.update(
            name.replace("ok_", "") + "_char_frac" for name in rep_rules
        )
    missing = sorted(needed - set(signals_columns))
    if missing:
        raise ValueError(
            "signals table lacks columns the requested thresholds read: "
            f"{missing} — rebuild rule_signals with matching widths, or "
            "pass gopher_repetition_kwargs={'widths': ...} matching the "
            "published table"
        )
    return flags


def curate_from_signals(
    docs: DataFrame,
    signals: DataFrame,
    benchmark: DataFrame,
    min_tokens: int = 5,
    rates: dict[str, float] | None = None,
    default_rate: float = 0.1,
    budget: int = 64,
    token_count: Column | None = None,
    lm_quantile: float | None = None,
    approx_threshold: bool = False,
    c4_clean: bool = False,
    c4_kwargs: dict | None = None,
    gopher_quality: bool = False,
    gopher_quality_kwargs: dict | None = None,
    gopher_repetition: bool = False,
    gopher_repetition_kwargs: dict | None = None,
    ccnet_keep: tuple[str, ...] | None = None,
    strata_col: str = "source",
    pin: bool = True,
) -> DataFrame:
    """Phase 2 of the two-phase curation shape: run the pipeline with the
    rule gates (stages 1-4) resolved by THRESHOLDING a published
    :func:`rule_signals` table instead of recomputing metrics — filter
    the signals, semi-join the corpus, then the corpus-interdependent
    tail (dedup → decontamination → band → mixing → packing) exactly as
    :func:`curate` runs it (:func:`_curate_tail` is shared verbatim).
    Iterating thresholds re-pays only this call — never the gram
    shuffles of phase 1.

    Equivalence contract: with ``signals = rule_signals(docs, c4_clean,
    c4_kwargs, widths)`` and matching thresholds, the packed output is
    bit-identical to :func:`curate` — the threshold expressions are the
    SAME rule conjunctions (``functions.text.gopher_quality_pass_expr``,
    ``operators.corpus.repetition_pass_expr``) the inline flag operators
    apply, over metrics those operators rounded before publishing, and
    the per-doc rule verdicts commute with the stage order (a
    conjunction), so the gated set is the pipeline's own. ``c4_clean``
    re-applies the deterministic line REWRITE here (a projection — the
    keep decision itself comes from the signals column) because every
    tail stage judges the cleaned text.

    Scale: the signals filter is a scan with pushed predicates over a
    table ~1e-3 the corpus bytes; the semi-join is doc_id-partitioned;
    everything else is :func:`curate`'s own tail. ``pin=False`` skips
    every stage-seam persist (the gated corpus and the band stages'
    scored frames) — pass it from threshold-ITERATION loops: CacheManager
    entries live until session end, so N pinned iterations hold up to 3N
    corpus-scale cache entries (the same opt-out contract as the
    streaming callers of :func:`curate`'s stages)."""
    _require_scoreable(min_tokens, lm_quantile, ccnet_keep)
    flags = _signal_rule_flags(
        signals.columns, c4_clean,
        gopher_quality, gopher_quality_kwargs,
        gopher_repetition, gopher_repetition_kwargs,
    )
    keep_cond = (
        flags["_c4"] & (F.col("n_tokens") >= min_tokens)
        & flags["_gq"] & flags["_gr"]
    )
    keep_ids = signals.filter(keep_cond).select("doc_id")
    if c4_clean:
        others = [c for c in docs.columns if c not in ("doc_id", "text")]
        work = T.c4_line_clean(
            docs, "text", "doc_id",
            passthrough=tuple(others), **(c4_kwargs or {}),
        ).select("doc_id", F.col("clean_text").alias("text"), *others)
    else:
        work = docs
    gated = work.join(keep_ids, "doc_id", "left_semi")
    tokens = (
        token_count if token_count is not None else T.token_count(F.col("text"))
    )
    return _curate_tail(
        gated, benchmark, tokens, rates, default_rate, budget,
        lm_quantile, approx_threshold, ccnet_keep, strata_col,
        pin_gated=True, pin=pin,
    )


def audit(
    docs: DataFrame,
    benchmark: DataFrame,
    min_tokens: int = 5,
    rates: dict[str, float] | None = None,
    default_rate: float = 0.1,
    token_count: Column | None = None,
    lm_quantile: float | None = None,
    approx_threshold: bool = False,
    c4_clean: bool = False,
    c4_kwargs: dict | None = None,
    gopher_quality: bool = False,
    gopher_quality_kwargs: dict | None = None,
    gopher_repetition: bool = False,
    gopher_repetition_kwargs: dict | None = None,
    ccnet_keep: tuple[str, ...] | None = None,
    strata_col: str = "source",
) -> DataFrame:
    """Per-document curation verdict — the debuggability complement to
    :func:`curate`: every doc gets the FIRST stage that dropped it, in
    :data:`STAGE_ORDER` (``c4_dropped`` → ``short`` → ``gopher_quality``
    → ``gopher_repetition`` → ``duplicate`` → ``contaminated`` →
    ``low_quality`` → ``ppl_tail`` → ``sampled_out``) or ``kept``. Stage
    decisions are the same operator expressions the pipeline runs (the
    rule flags, dedup winners, decontamination flags, the
    :func:`_lm_band_ids` / :func:`_ccnet_band_ids` thresholds,
    ``sampling.stratified_keep_expr``), computed over the same stage
    input sets, so the audit can never disagree with the pipeline.
    Narrow left joins on doc_id (rule/winner/contaminated/band sets —
    all key-only frames); the projection-pure rule flags (C4, Gopher
    quality) are evaluated on the full corpus (every doc needs a row
    here) and give the same per-doc values the pipeline computes on its
    gated subsets, while the shuffling repetition metric is fed only the
    pipeline's own stage input — docs dropped earlier never consult its
    flag, so the smaller input is unobservable. Verdict names appear only for enabled stages, mirroring
    :func:`curate` (including the LM stages' ``min_tokens >= 2``
    requirement); with ``c4_clean`` every downstream stage judges the
    REWRITTEN text, exactly as the pipeline does."""
    _require_scoreable(min_tokens, lm_quantile, ccnet_keep)
    tokens = token_count if token_count is not None else T.token_count(F.col("text"))
    if c4_clean:
        base = T.c4_line_clean(
            docs, "text", "doc_id",
            passthrough=("source",), **(c4_kwargs or {}),
        ).select(
            "doc_id",
            F.col("clean_text").alias("text"),
            "source",
            F.col("keep").alias("_c4"),
        )
    else:
        base = docs.select(
            "doc_id", "text", "source", F.lit(True).alias("_c4")
        )
    base = rebalance_for_compute(
        base.select("doc_id", "text", "source", "_c4", tokens.alias("_n")),
        "doc_id",
    )
    work = base
    if gopher_quality:
        work = T.gopher_quality_flags(
            work, "text", "doc_id",
            passthrough=("text", "source", "_c4", "_n"),
            **(gopher_quality_kwargs or {}),
        ).select(
            "doc_id", "text", "source", "_c4", "_n",
            F.col("pass").alias("_gq"),
        )
    else:
        work = work.withColumn("_gq", F.lit(True))
    if gopher_repetition:
        # metric aggregation shuffles, so feed it only the docs that
        # survive the earlier gates (the pipeline's own input to this
        # stage): a doc dropped earlier never consults _gr — its verdict
        # fired on a prior WHEN — so the missing rows (NULL _gr) are
        # unobservable and the gram volume halves
        pre = work.filter(
            F.col("_c4") & (F.col("_n") >= min_tokens) & F.col("_gq")
        )
        rep = _gopher_rep(
            pre, "text", "doc_id", **(gopher_repetition_kwargs or {})
        ).select("doc_id", F.col("pass").alias("_gr"))
        work = work.join(rep, "doc_id", "left")
    else:
        work = work.withColumn("_gr", F.lit(True))

    return _audit_tail(
        work, benchmark, min_tokens, rates, default_rate,
        lm_quantile, approx_threshold, ccnet_keep, strata_col,
    )


def _audit_tail(
    work: DataFrame,
    benchmark: DataFrame,
    min_tokens: int,
    rates: dict[str, float] | None,
    default_rate: float,
    lm_quantile: float | None,
    approx_threshold: bool,
    ccnet_keep: tuple[str, ...] | None,
    strata_col: str,
    pin: bool = True,
) -> DataFrame:
    """Stages 5-9 of the audit verdict over a flagged corpus frame —
    ``work`` carries ``(doc_id, text, source, _c4, _n, _gq, _gr)`` with
    the rule flags already resolved (inline by :func:`audit`, or by
    thresholding a published signals table in
    :func:`audit_from_signals` — the two entry points share THIS body,
    so their verdicts cannot drift). Dedup winners, contamination, and
    the band memberships are computed over the pipeline's own stage
    input sets; the verdict is the first failing stage in
    :data:`STAGE_ORDER`."""
    if pin:
        # verdict output + every stage set derives from it
        work = _pin(work)
    gated = work.filter(
        F.col("_c4") & (F.col("_n") >= min_tokens)
        & F.col("_gq") & (F.col("_gr") == F.lit(True))
    )
    winners = dedup.exact_fingerprints(gated, "text", "doc_id").select(
        "doc_id", F.lit(True).alias("_win")
    )
    survivors = gated.join(winners.select("doc_id"), "doc_id", "left_semi")
    cont = (
        dedup.decontaminate(survivors, benchmark, "text", "doc_id", n=3)
        .filter(F.col("contaminated"))
        .select("doc_id", F.lit(True).alias("_cont"))
    )
    out = work.join(winners, "doc_id", "left").join(cont, "doc_id", "left")
    verdict = (
        F.when(~F.col("_c4"), "c4_dropped")
        .when(F.col("_n") < min_tokens, "short")
        .when(~F.col("_gq"), "gopher_quality")
        .when(~F.col("_gr"), "gopher_repetition")
        .when(F.col("_win").isNull(), "duplicate")
        .when(F.col("_cont").isNotNull(), "contaminated")
    )
    # score the SAME corpus the pipeline scores: post-decontamination
    # survivors (the model is trained on the set it filters, so the
    # thresholds match curate()'s bit for bit)
    clean = survivors.join(cont.select("doc_id"), "doc_id", "left_anti")
    if (lm_quantile is not None or ccnet_keep is not None) and pin:
        clean = _pin(clean)
    if lm_quantile is not None:
        band = _lm_band_ids(
            clean, lm_quantile, approx_threshold, pin=pin
        ).select("doc_id", F.lit(True).alias("_band"))
        out = out.join(band, "doc_id", "left")
        verdict = verdict.when(F.col("_band").isNull(), "low_quality")
        clean = clean.join(band.select("doc_id"), "doc_id", "left_semi")
    if ccnet_keep is not None:
        cc = _ccnet_band_ids(
            clean, ccnet_keep, strata_col, approx_threshold, pin=pin
        ).select("doc_id", F.lit(True).alias("_cc"))
        out = out.join(cc, "doc_id", "left")
        verdict = verdict.when(F.col("_cc").isNull(), "ppl_tail")
    keep = sampling.stratified_keep_expr(
        "doc_id", "source", rates or {}, default_rate
    )
    return out.select(
        "doc_id",
        verdict.when(~keep, "sampled_out").otherwise("kept").alias("verdict"),
    )


def audit_from_signals(
    docs: DataFrame,
    signals: DataFrame,
    benchmark: DataFrame,
    min_tokens: int = 5,
    rates: dict[str, float] | None = None,
    default_rate: float = 0.1,
    lm_quantile: float | None = None,
    approx_threshold: bool = False,
    c4_clean: bool = False,
    c4_kwargs: dict | None = None,
    gopher_quality: bool = False,
    gopher_quality_kwargs: dict | None = None,
    gopher_repetition: bool = False,
    gopher_repetition_kwargs: dict | None = None,
    ccnet_keep: tuple[str, ...] | None = None,
    strata_col: str = "source",
    pin: bool = True,
) -> DataFrame:
    """:func:`audit`'s verdict derived from a published
    :func:`rule_signals` table (VERDICT r13 #5): the rule-stage flags
    (C4 keep, token count, Gopher quality, Gopher repetition) come from
    THRESHOLDING the signals columns — :func:`_signal_rule_flags`, the
    same expressions :func:`curate_from_signals` gates with — instead of
    re-running the metric operators, which collapses the audit plan from
    the inline path's full rule recomputation (the registry's heaviest
    plan: 216 exchanges / 143 scans at r13) to one signals scan plus the
    corpus-interdependent tail. The tail (dedup winners, contamination,
    band memberships, sampling verdict) is :func:`_audit_tail`, shared
    verbatim with :func:`audit`, so the two audit paths cannot drift;
    the equivalence contract with the inline audit is
    :func:`curate_from_signals`'s (same rounded metrics, same rule
    conjunctions, verdicts commute with the conjunction).

    Coverage contract: ``signals`` must hold one row per ``docs`` row
    (:func:`rule_signals` emits exactly that); the flag join is inner,
    so a doc absent from the signals table gets NO verdict — publish
    signals and corpus from the same snapshot. With ``c4_clean`` the
    deterministic line REWRITE is re-applied here (a projection — the
    keep decision itself comes from the signals column) because every
    tail stage judges the cleaned text."""
    _require_scoreable(min_tokens, lm_quantile, ccnet_keep)
    flags = _signal_rule_flags(
        signals.columns, c4_clean,
        gopher_quality, gopher_quality_kwargs,
        gopher_repetition, gopher_repetition_kwargs,
    )
    sig = signals.select(
        "doc_id",
        flags["_c4"].alias("_c4"),
        F.col("n_tokens").alias("_n"),
        flags["_gq"].alias("_gq"),
        flags["_gr"].alias("_gr"),
    )
    if c4_clean:
        others = [c for c in docs.columns if c not in ("doc_id", "text")]
        work_docs = T.c4_line_clean(
            docs, "text", "doc_id",
            passthrough=tuple(others), **(c4_kwargs or {}),
        ).select("doc_id", F.col("clean_text").alias("text"), *others)
    else:
        work_docs = docs
    work = work_docs.select("doc_id", "text", "source").join(sig, "doc_id")
    return _audit_tail(
        work, benchmark, min_tokens, rates, default_rate,
        lm_quantile, approx_threshold, ccnet_keep, strata_col, pin=pin,
    )

"""End-to-end curation pipeline: each stage's effect on a crafted corpus."""

from __future__ import annotations

from learn_hbase_spark.pipeline.curation import curate


def test_curate_stage_effects(spark):
    docs = spark.createDataFrame(
        [
            # survives everything (6 tokens, unique, clean, src0 rate=1.0)
            (1, "alpha beta gamma delta epsilon zeta", "src0"),
            # duplicate of 1 (same normalized text) → dropped by exact dedup
            (2, "Alpha  beta GAMMA delta epsilon zeta", "src0"),
            # too short → dropped by the quality gate
            (3, "tiny doc", "src0"),
            # shares a 3-gram with the benchmark doc → dropped as contaminated
            (4, "the held out secret phrase appears here", "src0"),
        ],
        "doc_id long, text string, source string",
    )
    bench = spark.createDataFrame(
        [(99, "contains the held out secret phrase indeed", "src0")],
        "doc_id long, text string, source string",
    )
    out = curate(docs, bench, min_tokens=5, rates={"src0": 1.0}, budget=64)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1}
    assert rows[1]["seq_id"] == 0  # first (only) doc in its pack stream


def test_curate_packs_across_budget(spark):
    docs = spark.createDataFrame(
        [
            # unique 10-token texts so exact dedup keeps all of them
            (i, " ".join(f"d{i}w{j}" for j in range(10)), "s")
            for i in range(8)
        ],
        "doc_id long, text string, source string",
    )
    bench = spark.createDataFrame([], "doc_id long, text string, source string")
    out = curate(docs, bench, min_tokens=1, rates={"s": 1.0}, budget=15)
    # every doc kept; each 15-token bin fits one 10-token doc's start, so
    # consecutive docs in one stream land in distinct bins
    rows = out.collect()
    assert len(rows) == 8
    for r in rows:
        assert r["seq_id"] >= 0 and len(r["pack_group"]) == 2


def test_audit_kept_set_equals_pipeline_survivors(spark):
    from pyspark.sql import functions as F

    from learn_hbase_spark import tables
    from learn_hbase_spark.pipeline import curation

    docs = tables.load_table(spark, "/root/testdata/sf0.001", "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    kw = dict(
        min_tokens=5,
        rates={"src0": 1.0, "src1": 0.5, "src2": 0.25},
        default_rate=0.1,
    )
    packed_ids = {
        r["doc_id"] for r in curation.curate(docs, bench, **kw).collect()
    }
    verdicts = curation.audit(docs, bench, **kw).collect()
    kept_ids = {r["doc_id"] for r in verdicts if r["verdict"] == "kept"}
    assert kept_ids == packed_ids
    # every doc gets exactly one verdict
    assert len(verdicts) == docs.count()


def test_lm_band_drops_low_quality_before_mixing(spark):
    """The optional bigram-LM band (CCNet-style): with lm_quantile set,
    the bottom-percentile docs drop with verdict 'low_quality', the kept
    sets of curate() and audit() still agree, and with lm_quantile=None
    the stage (and its verdict) is absent entirely."""
    from pyspark.sql import functions as F

    from learn_hbase_spark import tables
    from learn_hbase_spark.pipeline import curation

    docs = tables.load_table(spark, "/root/testdata/sf0.001", "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    kw = dict(
        min_tokens=5,
        rates={"src0": 1.0, "src1": 0.5, "src2": 0.25},
        default_rate=0.1,
    )
    base_verdicts = {r["doc_id"]: r["verdict"]
                     for r in curation.audit(docs, bench, **kw).collect()}
    assert "low_quality" not in set(base_verdicts.values())

    banded = {r["doc_id"]: r["verdict"]
              for r in curation.audit(docs, bench, lm_quantile=0.10,
                                      **kw).collect()}
    lowq = {d for d, v in banded.items() if v == "low_quality"}
    # ~10% of the post-decontamination corpus drops; every dropped doc
    # previously reached the sampling stage (kept or sampled_out)
    assert lowq
    assert all(base_verdicts[d] in ("kept", "sampled_out") for d in lowq)
    # earlier-stage verdicts are untouched by the new stage
    for d, v in base_verdicts.items():
        if v in ("short", "duplicate", "contaminated"):
            assert banded[d] == v

    packed_ids = {
        r["doc_id"]
        for r in curation.curate(docs, bench, lm_quantile=0.10,
                                 **kw).collect()
    }
    kept_ids = {d for d, v in banded.items() if v == "kept"}
    assert kept_ids == packed_ids


def test_lm_band_requires_scoreable_min_tokens(spark):
    """The bigram-LM band can only judge docs with >= 1 bigram, so
    lm_quantile with min_tokens < 2 is refused up front — otherwise a
    one-token doc would be dropped as low_quality without ever being
    scored."""
    import pytest

    from learn_hbase_spark.pipeline import curation

    docs = spark.createDataFrame(
        [(1, "one", "src0")], "doc_id long, text string, source string"
    )
    bench = spark.createDataFrame([("zzz yyy xxx www",)], "text string")
    with pytest.raises(ValueError, match="min_tokens >= 2"):
        curation.curate(docs, bench, min_tokens=1, lm_quantile=0.1)
    with pytest.raises(ValueError, match="min_tokens >= 2"):
        curation.audit(docs, bench, min_tokens=1, lm_quantile=0.1)


def test_rule_stages_first_drop_order(spark):
    """The composed quality-rule stages (C4 -> short -> gopher_quality ->
    gopher_repetition -> duplicate -> contaminated -> sampled_out) drop
    each crafted doc at its designed stage, the verdict is the FIRST
    failing stage in STAGE_ORDER (docB fails C4 *and* the token gate but
    reports c4_dropped), and curate()/audit() kept sets agree."""
    from learn_hbase_spark.pipeline import curation

    def long_doc(tag: str, lines: int = 6, first: str | None = None) -> str:
        # ~48 unique-ish words so the Gopher top-n-gram rules (which a
        # genuinely short doc cannot pass: one 4-gram is >16% of its
        # chars) judge a realistic page
        built = [
            "the " + " ".join(f"{tag}{k}w{j}" for j in range(7)) + "."
            for k in range(lines)
        ]
        if first is not None:
            built[0] = first
        return "\n".join(built)

    rep_line = "the abc def abc def abc def abc def abc def abc def ok."
    noswd = "zebra quagga okapi lemur tapir runs fast today."
    noswd2 = "bison gaur saola addax turns left quite quickly."
    cont1 = "the held out secret phrase appears right here today."
    doc1 = long_doc("a")
    docs = spark.createDataFrame(
        [
            (1, doc1, "src0"),                                   # kept
            (2, "{ tiny }", "src0"),                             # c4_dropped
            (3, "the small cat sat.\nthe big dog ran.", "src0"), # short (8 < 12)
            (4, f"{noswd}\n{noswd2}", "src0"),                   # gopher_quality
            (5, f"{rep_line}\n{rep_line}", "src0"),              # gopher_repetition
            (6, doc1.upper(), "src0"),                           # duplicate of 1
            (7, long_doc("c", first=cont1), "src0"),             # contaminated
            (8, long_doc("m"), "srcX"),                          # sampled_out
        ],
        "doc_id long, text string, source string",
    )
    bench = spark.createDataFrame(
        [(99, "contains the held out secret phrase indeed", "src0")],
        "doc_id long, text string, source string",
    )
    kw = dict(
        min_tokens=12,
        rates={"src0": 1.0},
        default_rate=0.0,
        c4_clean=True,
        c4_kwargs={"min_words_per_line": 4, "min_lines": 2},
        gopher_quality=True,
        gopher_quality_kwargs={"min_words": 8, "min_stopwords": 1},
        gopher_repetition=True,
        gopher_repetition_kwargs={"widths": (2, 3, 4, 9)},
    )
    verdicts = {
        r["doc_id"]: r["verdict"]
        for r in curation.audit(docs, bench, **kw).collect()
    }
    assert verdicts == {
        1: "kept",
        2: "c4_dropped",
        3: "short",
        4: "gopher_quality",
        5: "gopher_repetition",
        6: "duplicate",
        7: "contaminated",
        8: "sampled_out",
    }
    packed = {
        r["doc_id"] for r in curation.curate(docs, bench, budget=64, **kw).collect()
    }
    assert packed == {1}
    # the verdict precedence is the pinned pipeline stage order
    assert curation.STAGE_ORDER == (
        "c4_dropped", "short", "gopher_quality", "gopher_repetition",
        "duplicate", "contaminated", "low_quality", "ppl_tail",
        "sampled_out", "kept",
    )


def test_ccnet_bucket_stage(spark):
    """With ccnet_keep=('head','middle') each source's worst LM tertile
    drops as ppl_tail; earlier-stage verdicts are untouched; curate() and
    audit() kept sets agree."""
    from pyspark.sql import functions as F

    from learn_hbase_spark import tables
    from learn_hbase_spark.pipeline import curation

    docs = tables.load_table(spark, "/root/testdata/sf0.001", "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    kw = dict(
        min_tokens=5,
        rates={"src0": 1.0, "src1": 0.5, "src2": 0.25},
        default_rate=0.1,
    )
    base = {r["doc_id"]: r["verdict"]
            for r in curation.audit(docs, bench, **kw).collect()}
    assert "ppl_tail" not in set(base.values())
    banded = {r["doc_id"]: r["verdict"]
              for r in curation.audit(docs, bench,
                                      ccnet_keep=("head", "middle"),
                                      **kw).collect()}
    tail = {d for d, v in banded.items() if v == "ppl_tail"}
    assert tail
    assert all(base[d] in ("kept", "sampled_out") for d in tail)
    for d, v in base.items():
        if v in ("short", "duplicate", "contaminated"):
            assert banded[d] == v
    packed = {
        r["doc_id"]
        for r in curation.curate(docs, bench, ccnet_keep=("head", "middle"),
                                 **kw).collect()
    }
    assert packed == {d for d, v in banded.items() if v == "kept"}


def test_signals_path_matches_inline_pipeline_under_defaults(spark):
    """The r11 review finding: rule_signals' default widths must satisfy
    curate_from_signals under ITS defaults (repetition_pass_expr's full
    2..10 set), and the signals-thresholded kept set must equal the
    inline pipeline's under matching parameters — including pin=False
    for the iteration-loop caller. A narrow-widths table must be
    REFUSED with a column-naming error, not an AnalysisException."""
    import pytest

    from learn_hbase_spark.pipeline import curation

    # passers must be LONG and gram-diverse: the default Gopher top-gram
    # thresholds (0.20/0.18/0.16) are calibrated for real documents, and
    # a short doc's single most-common 3-gram already exceeds them
    long1 = "the " + " ".join(f"alpha{j} word{j}" for j in range(30))
    long5 = "and " + " ".join(f"beta{j} item{j}" for j in range(30))
    docs = spark.createDataFrame(
        [
            (1, long1, "src0"),
            (2, "spam spam spam spam spam spam spam spam spam spam "
                "spam spam", "src0"),  # repetition-gated
            (3, " ".join(f"w{j}q" for j in range(12)), "src0"),  # no stops
            (4, "tiny doc", "src0"),  # token gate
            (5, long5, "src0"),
        ],
        "doc_id long, text string, source string",
    )
    bench = spark.createDataFrame(
        [], "doc_id long, text string, source string"
    )
    kw = dict(
        min_tokens=5, rates={"src0": 1.0}, budget=64,
        gopher_quality=True,
        gopher_quality_kwargs={"min_words": 10, "min_stopwords": 1},
        gopher_repetition=True,
    )
    inline = {r["doc_id"] for r in curation.curate(docs, bench, **kw).collect()}

    signals = curation.rule_signals(docs)  # DEFAULT widths: full 2..10
    via_signals = {
        r["doc_id"]
        for r in curation.curate_from_signals(
            docs, signals, bench, pin=False, **kw
        ).collect()
    }
    assert via_signals == inline and 1 in inline and 2 not in inline

    narrow = curation.rule_signals(docs, widths=(2, 3, 4, 9))
    with pytest.raises(ValueError, match="dup5_char_frac"):
        curation.curate_from_signals(docs, narrow, bench, pin=False, **kw)
    # matching narrow kwargs on BOTH sides still work
    got = {
        r["doc_id"]
        for r in curation.curate_from_signals(
            docs, narrow, bench, pin=False,
            gopher_repetition_kwargs={"widths": (2, 3, 4, 9)},
            **{k: v for k, v in kw.items()
               if k != "gopher_repetition_kwargs"},
        ).collect()
    }
    inline_narrow = {
        r["doc_id"]
        for r in curation.curate(
            docs, bench,
            gopher_repetition_kwargs={"widths": (2, 3, 4, 9)}, **kw
        ).collect()
    }
    assert got == inline_narrow


def test_audit_from_signals_matches_inline_audit(spark):
    """VERDICT r13 #5: the audit verdict derived from a PUBLISHED
    rule_signals table (audit_from_signals — one signals scan + the
    shared _audit_tail) equals the inline audit's verdict for EVERY doc
    on the corpus crafted to drop one doc at every stage, including the
    C4-rewrite composition; a signals table narrower than the requested
    repetition widths is refused by name."""
    import pytest

    from learn_hbase_spark.pipeline import curation

    def long_doc(tag: str, lines: int = 6, first: str | None = None) -> str:
        built = [
            "the " + " ".join(f"{tag}{k}w{j}" for j in range(7)) + "."
            for k in range(lines)
        ]
        if first is not None:
            built[0] = first
        return "\n".join(built)

    rep_line = "the abc def abc def abc def abc def abc def abc def ok."
    noswd = "zebra quagga okapi lemur tapir runs fast today."
    noswd2 = "bison gaur saola addax turns left quite quickly."
    cont1 = "the held out secret phrase appears right here today."
    doc1 = long_doc("a")
    docs = spark.createDataFrame(
        [
            (1, doc1, "src0"),
            (2, "{ tiny }", "src0"),
            (3, "the small cat sat.\nthe big dog ran.", "src0"),
            (4, f"{noswd}\n{noswd2}", "src0"),
            (5, f"{rep_line}\n{rep_line}", "src0"),
            (6, doc1.upper(), "src0"),
            (7, long_doc("c", first=cont1), "src0"),
            (8, long_doc("m"), "srcX"),
        ],
        "doc_id long, text string, source string",
    )
    bench = spark.createDataFrame(
        [(99, "contains the held out secret phrase indeed", "src0")],
        "doc_id long, text string, source string",
    )
    c4_kwargs = {"min_words_per_line": 4, "min_lines": 2}
    kw = dict(
        min_tokens=12,
        rates={"src0": 1.0},
        default_rate=0.0,
        c4_clean=True,
        c4_kwargs=c4_kwargs,
        gopher_quality=True,
        gopher_quality_kwargs={"min_words": 8, "min_stopwords": 1},
        gopher_repetition=True,
        gopher_repetition_kwargs={"widths": (2, 3, 4, 9)},
    )
    inline = {
        r["doc_id"]: r["verdict"]
        for r in curation.audit(docs, bench, **kw).collect()
    }
    signals = curation.rule_signals(
        docs, c4_clean=True, c4_kwargs=c4_kwargs, widths=(2, 3, 4, 9)
    )
    via_signals = {
        r["doc_id"]: r["verdict"]
        for r in curation.audit_from_signals(
            docs, signals, bench, pin=False, **kw
        ).collect()
    }
    assert via_signals == inline
    assert set(inline.values()) >= {
        "kept", "c4_dropped", "short", "gopher_quality",
        "gopher_repetition", "duplicate", "contaminated", "sampled_out",
    }
    # a table built without dup9 cannot answer widths=(2,3,4,9,10)
    with pytest.raises(ValueError, match="dup10_char_frac"):
        curation.audit_from_signals(
            docs, signals, bench, pin=False,
            **{**kw, "gopher_repetition_kwargs": {"widths": (2, 3, 4, 9, 10)}},
        )

"""Decontamination, TF-IDF top-k, and exact length profiles."""

from __future__ import annotations

from pyspark.sql import functions as F

from learn_hbase_spark.operators import corpus as corpus_ops
from learn_hbase_spark.operators.dedup import decontaminate


def test_decontaminate_flags_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox ran home"),  # shares 2 shingles
            (2, "completely different words entirely"),
            (3, ""),  # degenerate: single whole-text shingle ""
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in decontaminate(corpus, bench, n=3).collect()
    }
    # "the quick brown" and "quick brown fox" overlap; "brown fox ran" etc. don't
    assert got[1] == (2, True)
    assert got[2] == (0, False)
    assert got[3] == (0, False)
    assert len(got) == 3  # every corpus row present, clean or not


def test_tfidf_topk_ranking(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "banana cherry common"),
            (3, "common words only common"),
        ],
        "doc_id long, text string",
    )
    out = corpus_ops.tfidf_topk(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["tf"], r["df"]))
    for v in by_doc.values():
        v.sort()
    # doc 1: apple tf=2 wins; then banana (df=2) before common (df=3)
    assert [t for _, t, _, _ in by_doc[1]] == ["apple", "banana"]
    # doc 3: common tf=2 first, then only (df=1) — words also df=1 but 'only' < 'words'
    assert [t for _, t, _, _ in by_doc[3]] == ["common", "only"]
    assert all(len(v) <= 2 for v in by_doc.values())


def test_length_profile_exact_quantiles(spark):
    rows = [(i, "s", i) for i in range(1, 11)]  # values 1..10, one group
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    r = corpus_ops.length_profile(df).collect()[0]
    # ceil(0.1*10)=1 → 1; ceil(0.5*10)=5 → 5; ceil(0.9*10)=9 → 9
    assert (r["v_min"], r["p10"], r["p50"], r["p90"], r["v_max"], r["n"]) == (
        1, 1, 5, 9, 10, 10,
    )


def test_length_profile_single_row_group(spark):
    df = spark.createDataFrame(
        [(1, "a", 7)], "doc_id long, source string, n_chars long"
    )
    r = corpus_ops.length_profile(df).collect()[0]
    assert (r["p10"], r["p50"], r["p90"]) == (7, 7, 7)


def test_bigram_lm_score_matches_hand_computation(spark):
    """Tiny corpus, add-1 smoothing, hand-computed reference: two docs,
    checked bigram by bigram against the closed form
    P(w2|w1) = (C(w1,w2)+1)/(C(w1)+V)."""
    import math
    from collections import Counter

    from learn_hbase_spark.operators.corpus import bigram_lm_score

    texts = {1: "a b a b", 2: "a b c"}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")

    seqs = {i: ["<s>"] + t.split() for i, t in texts.items()}
    pairs = [
        (s[j], s[j + 1]) for s in seqs.values() for j in range(len(s) - 1)
    ]
    c2, c1 = Counter(pairs), Counter(p[0] for p in pairs)
    vocab = {p[1] for p in pairs}
    expect = {}
    for i, s in seqs.items():
        lps = [
            math.log((c2[(s[j], s[j + 1])] + 1) / (c1[s[j]] + len(vocab)))
            for j in range(len(s) - 1)
        ]
        expect[i] = (len(lps), round(sum(lps) / len(lps), 6))

    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in bigram_lm_score(df).collect()
    }
    assert got == expect

    # repeated-order doc scores higher than the one with the novel token
    assert got[1][1] > got[2][1]


def test_bigram_lm_score_frozen_fallback_branches(spark):
    """The frozen-model scorer's two C=0 branches, hand-computed: a crawl
    bigram with a SEEN context but unseen continuation scores
    (0+1)/(C(w1)+V); a wholly UNSEEN context scores (0+1)/(0+V) = 1/V.
    Model-seen bigrams score exactly as the self-trained form would."""
    import math
    from collections import Counter

    from learn_hbase_spark.operators.corpus import bigram_lm_score_frozen

    model = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    crawl = spark.createDataFrame(
        [
            (10, "a b"),    # every bigram model-seen
            (11, "a z"),    # seen context 'a', unseen continuation 'z'
            (12, "q r"),    # wholly unseen context 'q' (and '<s> q')
        ],
        "doc_id long, text string",
    )

    seqs = [["<s>", "a", "b", "a", "b"], ["<s>", "a", "b", "c"]]
    pairs = [(s[j], s[j + 1]) for s in seqs for j in range(len(s) - 1)]
    c2, c1 = Counter(pairs), Counter(p[0] for p in pairs)
    V = len({p[1] for p in pairs})

    def lp(w1, w2):
        return math.log((c2[(w1, w2)] + 1) / (c1[w1] + V))

    expect = {
        10: round((lp("<s>", "a") + lp("a", "b")) / 2, 6),
        11: round((lp("<s>", "a") + lp("a", "z")) / 2, 6),
        12: round((lp("<s>", "q") + lp("q", "r")) / 2, 6),
    }
    assert math.isclose(lp("q", "r"), math.log(1 / V))

    got = {r["doc_id"]: r["avg_logprob"]
           for r in bigram_lm_score_frozen(crawl, model).collect()}
    assert got == expect
    # in-model word order scores best; unseen tokens progressively worse
    assert got[10] > got[11] > got[12]


def _bucket(gram: str, buckets: int) -> int:
    import hashlib

    return int(hashlib.md5(gram.encode()).hexdigest()[:6], 16) % buckets


def test_hashed_gram_buckets_feature_set(spark):
    """'a b c' yields 3 unigrams + 2 bigrams; a single-token doc yields
    only its unigram; an empty doc yields nothing — and every bucket id
    matches the md5-hex family replicated in pure Python."""
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "x"), (3, "")], "doc_id long, text string"
    )
    rows = corpus_ops.hashed_gram_buckets(df, buckets=64).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(r["bucket"])
    assert sorted(got[1]) == sorted(
        _bucket(g, 64) for g in ["a", "b", "c", "a b", "b c"]
    )
    assert got[2] == [_bucket("x", 64)]
    assert 3 not in got


def test_dsir_weights_hand_computation(spark):
    """Tiny target/raw corpora, buckets=64: the summed log importance
    ratio matches a pure-Python replay of the hashed distributions and
    add-1 smoothing."""
    import math
    from collections import Counter

    B = 64
    target = {10: "alpha beta", 11: "alpha gamma alpha"}
    raw = {1: "alpha beta", 2: "delta epsilon zeta", 3: "alpha"}

    def grams(text):
        w = text.split()
        return w + [f"{a} {b}" for a, b in zip(w, w[1:])]

    tcnt = Counter(_bucket(g, B) for t in target.values() for g in grams(t))
    rcnt = Counter(_bucket(g, B) for t in raw.values() for g in grams(t))
    tn, rn = sum(tcnt.values()), sum(rcnt.values())
    expect = {}
    for i, t in raw.items():
        gs = [_bucket(g, B) for g in grams(t)]
        lw = sum(
            math.log((tcnt[b] + 1.0) / (tn + B))
            - math.log((rcnt[b] + 1.0) / (rn + B))
            for b in gs
        )
        expect[i] = (len(gs), round(lw, 6))

    tdf = spark.createDataFrame(list(target.items()), "doc_id long, text string")
    rdf = spark.createDataFrame(list(raw.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["log_weight"])
        for r in corpus_ops.dsir_weights(rdf, tdf, buckets=B).collect()
    }
    assert got == expect
    # the raw doc that IS a target doc outscores the disjoint-vocab one
    assert got[1][1] > got[2][1]


def test_dsir_select_top_quantile(spark):
    """Selection keeps exactly the weights at or above the rounded 1-q
    quantile: every kept weight >= every dropped weight, and the target
    doc's twin survives while the disjoint-vocab doc does not."""
    target = [(10, "alpha beta gamma")]
    raw = [
        (1, "alpha beta gamma"),
        (2, "delta epsilon zeta eta"),
        (3, "alpha beta"),
        (4, "theta iota kappa"),
    ]
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    all_w = {
        r["doc_id"]: r["log_weight"]
        for r in corpus_ops.dsir_weights(rdf, tdf, buckets=64).collect()
    }
    kept = {
        r["doc_id"]: r["log_weight"]
        for r in corpus_ops.dsir_select(
            rdf, tdf, buckets=64, keep_frac=0.25
        ).collect()
    }
    assert kept  # threshold is a quantile of the weights — never empty
    assert set(kept) <= set(all_w)
    dropped = {i: w for i, w in all_w.items() if i not in kept}
    assert min(kept.values()) >= max(dropped.values())
    assert 1 in kept and 2 not in kept


def test_hashed_classifier_score_hand(spark):
    """Explicit 2-row weight table, buckets=4: margin is the mean of
    looked-up weights with absent buckets weighing 0, prob is the
    sigmoid of the ROUNDED margin."""
    import math

    B = 4
    wtab = {0: 0.5, 1: -0.25, 2: 0.125, 3: -0.75}
    texts = {1: "a b c", 2: "x"}
    covered = {0, 1}  # table rows actually provided
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    weights = spark.createDataFrame(
        [(b, wtab[b]) for b in sorted(covered)], "bucket long, wt double"
    )

    def grams(text):
        w = text.split()
        return w + [f"{a} {b}" for a, b in zip(w, w[1:])]

    expect = {}
    for i, t in texts.items():
        ws = [
            wtab[_bucket(g, B)] if _bucket(g, B) in covered else 0.0
            for g in grams(t)
        ]
        margin = round(sum(ws) / len(ws), 6)
        expect[i] = (len(ws), margin, round(1.0 / (1.0 + math.exp(-margin)), 6))

    got = {
        r["doc_id"]: (r["n_grams"], r["margin"], r["prob"])
        for r in corpus_ops.hashed_classifier_score(
            df, weights, buckets=B
        ).collect()
    }
    assert got == expect


def test_percentile_inputs_are_prerounded(spark):
    """The memory invariant behind every exact-percentile threshold
    (SCALE.md "Exact-percentile thresholds"): Spark's exact percentile
    buffers O(distinct values), so each site MUST feed it round-6 scores.
    Asserts the three threshold inputs — dsir_weights.log_weight, the
    bigram-LM avg_logprob, and the unigram-LM avg_logprob — are fixed
    points of round(., 6)."""
    docs = [
        (i, " ".join("w%d" % ((i * 7 + j) % 23) for j in range(12)))
        for i in range(40)
    ]
    rdf = spark.createDataFrame(docs, "doc_id long, text string")
    tdf = spark.createDataFrame(docs[:5], "doc_id long, text string")

    dsir = [
        r["log_weight"]
        for r in corpus_ops.dsir_weights(rdf, tdf, buckets=64).collect()
    ]
    bigram = [
        r["avg_logprob"]
        for r in corpus_ops.bigram_lm_score(rdf, "text", "doc_id").collect()
    ]
    from learn_hbase_spark import queries as Q

    unigram = [
        r["avg_logprob"]
        for r in Q._QUERIES["lm_score"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    ]
    for name, vals in (("dsir", dsir), ("bigram", bigram), ("unigram", unigram)):
        assert vals, name
        for v in vals:
            assert v == round(v, 6), (name, v)


def test_dsir_select_approx_threshold_switch(spark):
    """approx_threshold=True swaps the exact percentile for the
    fixed-state approx_percentile sketch; on a corpus small enough for
    the sketch to be exact the selection is identical, and the band
    invariant (every kept weight >= every dropped weight) always holds."""
    target = [(10, "alpha beta gamma")]
    raw = [
        (1, "alpha beta gamma"),
        (2, "delta epsilon zeta eta"),
        (3, "alpha beta"),
        (4, "theta iota kappa"),
    ]
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    exact = {
        r["doc_id"]
        for r in corpus_ops.dsir_select(
            rdf, tdf, buckets=64, keep_frac=0.25
        ).collect()
    }
    approx = {
        r["doc_id"]: r["log_weight"]
        for r in corpus_ops.dsir_select(
            rdf, tdf, buckets=64, keep_frac=0.25, approx_threshold=True
        ).collect()
    }
    all_w = {
        r["doc_id"]: r["log_weight"]
        for r in corpus_ops.dsir_weights(rdf, tdf, buckets=64).collect()
    }
    assert approx
    dropped = [w for i, w in all_w.items() if i not in approx]
    if dropped:
        assert min(approx.values()) >= max(dropped)
    # 4 distinct weights: the sketch is exact at this size, but
    # approx_percentile returns a DATA value where exact interpolates —
    # both cut between the same neighbors, so the kept set can differ by
    # at most the docs whose weight ties the cut
    assert exact <= set(approx) or set(approx) <= exact


def test_dsir_gumbel_beta0_equals_deterministic(spark):
    """beta=0 kills the noise term, so Gumbel selection must equal the
    deterministic top-quantile dsir_select exactly — same kept ids, and
    gumbel_key collapses to the unperturbed log_weight."""
    target = [(10, "alpha beta gamma")]
    raw = [
        (1, "alpha beta gamma"),
        (2, "delta epsilon zeta eta"),
        (3, "alpha beta"),
        (4, "theta iota kappa"),
    ]
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    det = {
        r["doc_id"]: r["log_weight"]
        for r in corpus_ops.dsir_select(
            rdf, tdf, buckets=64, keep_frac=0.5
        ).collect()
    }
    noise_free = {
        r["doc_id"]: (r["log_weight"], r["gumbel_key"])
        for r in corpus_ops.dsir_select_gumbel(
            rdf, tdf, buckets=64, keep_frac=0.5, beta=0.0
        ).collect()
    }
    assert set(noise_free) == set(det)
    for i, (lw, gk) in noise_free.items():
        assert gk == lw == det[i]


def test_dsir_gumbel_salt_varies_and_is_replayable(spark):
    """Same salt -> byte-identical resample; different salt -> a fresh
    draw (perturbed keys differ). The keys themselves replay the
    documented md5 construction."""
    import hashlib
    import math

    target = [(10, "alpha beta gamma")]
    raw = [(i, "alpha beta w%d" % i) for i in range(1, 9)]
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    rdf = spark.createDataFrame(raw, "doc_id long, text string")

    def run(salt):
        return {
            r["doc_id"]: (r["log_weight"], r["gumbel_key"])
            for r in corpus_ops.dsir_select_gumbel(
                rdf, tdf, buckets=64, keep_frac=1.0, salt=salt
            ).collect()
        }

    a1, a2, b = run("s1"), run("s1"), ("s2" and run("s2"))
    assert a1 == a2
    assert any(a1[i][1] != b[i][1] for i in a1)
    # replay one key by hand
    i, (lw, gk) = sorted(a1.items())[0]
    h = int(hashlib.md5(f"{i}:s1".encode()).hexdigest()[:8], 16)
    u = (h + 0.5) / 4294967296.0
    assert gk == round(lw + (-math.log(-math.log(u))), 6)


def test_gopher_repetition_flags_hand_computation(spark):
    """Gopher repetition metrics against a pure-Python replay: top
    2/3/4-gram char fractions (count x word-chars of the gram / total
    word chars; count ties break to the longest gram) and duplicated
    5..10-gram fractions; a one-word doc is all zeros and passes."""
    from collections import Counter

    texts = {
        0: "a b a b a b a b",
        1: "one two three four five six seven eight",
        2: "x",
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )

    def replay(text):
        w = text.split()
        total = sum(len(x) for x in w)
        out = {}
        for n in range(2, 11):
            grams = [w[i:i + n] for i in range(len(w) - n + 1)]
            cnt = Counter(" ".join(g) for g in grams)
            if cnt:
                chars = lambda g: len(g) - g.count(" ")  # noqa: E731
                top_c, top_chars = max(
                    (c, chars(g)) for g, c in cnt.items()
                )
                top = round(top_c * top_chars / total, 6)
                dup = round(
                    sum(c * chars(g) for g, c in cnt.items() if c > 1)
                    / total, 6,
                )
            else:
                top = dup = 0.0
            if n <= 4:
                out[f"top{n}_char_frac"] = top
            if n >= 5:
                out[f"dup{n}_char_frac"] = dup
        return out

    got = {
        r["doc_id"]: r.asDict()
        for r in corpus_ops.gopher_repetition_flags(df).collect()
    }
    for i, text in texts.items():
        want = replay(text)
        for k, v in want.items():
            assert got[i][k] == v, (i, k, got[i][k], v)
    # doc 0 trips every rule with gram rows; doc 2 (one word) passes all
    assert not got[0]["pass"] and got[2]["pass"]
    assert got[0]["top2_char_frac"] == round(4 * 2 / 8, 6)  # "a b" x4


def test_perplexity_buckets_per_stratum_tertiles(spark):
    """Head/middle/tail are assigned against each stratum's OWN
    tertiles: a score that is 'head' in a weak stratum can be 'tail' in
    a strong one; >= keeps boundary docs in the better bucket; every
    stratum splits ~equally."""
    rows = (
        [(i, "A", float(i)) for i in range(9)]          # A scores 0..8
        + [(100 + i, "B", 100.0 + i) for i in range(9)]  # B scores 100..108
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    got = {
        r["doc_id"]: r["ppl_bucket"]
        for r in corpus_ops.perplexity_buckets(
            df, "doc_id", "score", "source"
        ).collect()
    }
    for base in (0, 100):
        ids = [base + i for i in range(9)]
        assert [got[i] for i in ids] == (
            ["tail"] * 3 + ["middle"] * 3 + ["head"] * 3
        ), [got[i] for i in ids]
    # A's best (8.0) is far below B's worst (100.0) yet still 'head' in A
    assert got[8] == "head"


def test_dsir_weights_frozen_hand_computation(spark):
    """Frozen-distribution DSIR against a pure-Python replay, covering
    all three bucket branches for a scored gram: seen in both
    references, seen in only one (either side), and unseen in both
    (the constant ln((rn+kB)/(tn+kB)) floor)."""
    import math
    from collections import Counter

    B = 64
    target = {10: "alpha beta"}
    raw_ref = {20: "alpha delta epsilon"}
    new = {1: "alpha beta", 2: "zeta eta", 3: "delta"}

    def grams(text):
        w = text.split()
        return w + [f"{a} {b}" for a, b in zip(w, w[1:])]

    tcnt = Counter(_bucket(g, B) for t in target.values() for g in grams(t))
    rcnt = Counter(_bucket(g, B) for t in raw_ref.values() for g in grams(t))
    tn, rn = sum(tcnt.values()), sum(rcnt.values())
    expect = {}
    for i, t in new.items():
        gs = [_bucket(g, B) for g in grams(t)]
        lw = sum(
            math.log((tcnt.get(b, 0) + 1.0) / (tn + B))
            - math.log((rcnt.get(b, 0) + 1.0) / (rn + B))
            for b in gs
        )
        expect[i] = (len(gs), round(lw, 6))

    tdf = spark.createDataFrame(list(target.items()), "doc_id long, text string")
    rdf = spark.createDataFrame(list(raw_ref.items()), "doc_id long, text string")
    ndf = spark.createDataFrame(list(new.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["log_weight"])
        for r in corpus_ops.dsir_weights_frozen(
            ndf, tdf, rdf, buckets=B
        ).collect()
    }
    assert got == expect
    # the raw-ref-only gram ('delta', rc=2) scores BELOW the
    # unseen-in-both floor per gram: doc 3 is one such gram
    assert got[3][1] < got[2][1] / got[2][0]


def test_gopher_repetition_widths_knob(spark):
    """widths=(2,3,4,9) — the production sampling knob — emits metrics,
    flags, and the pass conjunction for ONLY the selected widths, agrees
    with the full-width run on the shared columns, and rejects widths
    outside the paper's 2..10 range."""
    import pytest

    from learn_hbase_spark.operators import corpus

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat the cat sat again now ok"),
         (2, "alpha bravo charlie delta echo foxtrot golf hotel india")],
        "doc_id long, text string",
    )
    sampled = corpus.gopher_repetition_flags(
        docs, "text", "doc_id", widths=(2, 3, 4, 9)
    )
    assert set(sampled.columns) == {
        "doc_id", "top2_char_frac", "top3_char_frac", "top4_char_frac",
        "dup9_char_frac", "ok_top2", "ok_top3", "ok_top4", "ok_dup9",
        "pass",
    }
    full = corpus.gopher_repetition_flags(docs, "text", "doc_id")
    shared = ["doc_id", "top2_char_frac", "top3_char_frac",
              "top4_char_frac", "dup9_char_frac"]
    assert sorted(map(tuple, sampled.select(*shared).collect())) == sorted(
        map(tuple, full.select(*shared).collect())
    )
    with pytest.raises(ValueError, match="widths"):
        corpus.gopher_repetition_flags(docs, widths=(1, 2))
    with pytest.raises(ValueError, match="widths"):
        corpus.gopher_repetition_flags(docs, widths=())


def test_decontaminate_bloom_equals_exact(spark):
    """The Bloom-prefiltered two-phase decontamination is bit-identical to
    the exact operator (no false negatives in the filter; false positives
    removed by the confirm join) — on real table data and on a crafted
    corpus with and without hits."""
    from pyspark.sql import functions as F

    from learn_hbase_spark import tables
    from learn_hbase_spark.operators import dedup

    docs = tables.load_table(spark, "/root/testdata/sf0.001", "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    exact = sorted(map(tuple, dedup.decontaminate(
        corpus, bench, "text", "doc_id", n=3).collect()))
    bloom = sorted(map(tuple, dedup.decontaminate_bloom(
        corpus, bench, "text", "doc_id", n=3,
        expected_items=5_000, num_bits=131_072).collect()))
    assert bloom == exact
    assert any(r[2] for r in bloom)  # hits exist on this data


def test_perplexity_buckets_approx_and_null_stratum(spark):
    """approx_threshold buckets agree with exact on well-separated scores,
    and a NULL-stratum doc surfaces as 'unbucketed' instead of vanishing."""
    from learn_hbase_spark.operators import corpus

    rows = [(i, "s%d" % (i % 2), float(i)) for i in range(1, 31)]
    rows.append((99, None, 5.0))
    scored = spark.createDataFrame(
        rows, "doc_id long, source string, score double"
    )
    exact = {r["doc_id"]: r["ppl_bucket"]
             for r in corpus.perplexity_buckets(
                 scored, "doc_id", "score", "source").collect()}
    approx = {r["doc_id"]: r["ppl_bucket"]
              for r in corpus.perplexity_buckets(
                  scored, "doc_id", "score", "source",
                  approx_threshold=True).collect()}
    assert len(exact) == 31  # every input row, including the NULL stratum
    assert exact[99] == "unbucketed" and approx[99] == "unbucketed"
    assert set(exact.values()) == {"head", "middle", "tail", "unbucketed"}
    assert set(approx.values()) == {"head", "middle", "tail", "unbucketed"}
    # approx_percentile is discrete (returns member values) while the exact
    # path interpolates, so only BOUNDARY docs may move one bucket
    diff = [d for d in exact if exact[d] != approx[d]]
    assert len(diff) <= 4, (diff, exact, approx)


def test_classifier_train_matches_numpy_reference(spark):
    """Multi-round distributed training equals a single-node NumPy replica
    of the same math (hashed features, mean-weight margin, log-loss batch
    GD), and the trained weights separate the labeled classes when fed to
    the inference operator."""
    import hashlib
    import math
    import re as _re

    from learn_hbase_spark.operators import corpus

    texts = {
        1: ("the curated corpus reads cleanly and cites sources", 1.0),
        2: ("the curated text explains the method with care", 1.0),
        3: ("click here buy now win big prizes fast", 0.0),
        4: ("random spam spam words click click offer", 0.0),
        5: ("the curated essay reviews prior work properly", 1.0),
        6: ("buy cheap offer now limited deal spam", 0.0),
        # zero-gram doc: contributes NO gradient (no features) but still
        # counts in the 1/m batch divisor — pins the stated GD math
        7: ("   ", 1.0),
    }
    docs = spark.createDataFrame(
        [(i, t, y) for i, (t, y) in texts.items()],
        "doc_id long, text string, label double",
    )
    B, LR, R = 1000, 1.0, 3
    got = {
        r["bucket"]: r["wt"]
        for r in corpus.hashed_classifier_train(
            docs, "label", "text", "doc_id", B, lr=LR, rounds=R
        ).collect()
    }

    def buckets(text):
        words = [w for w in _re.sub(r"\s+", " ", text.lower()).strip().split(" ")
                 if w]
        grams = words + [f"{a} {b}" for a, b in zip(words, words[1:])]
        return [int(hashlib.md5(g.encode()).hexdigest()[:6], 16) % B
                for g in grams]

    feats = {i: buckets(t) for i, (t, y) in texts.items()}
    w = {}
    m = len(texts)  # ALL labeled docs, including the gram-less one
    for _ in range(R):
        grad = {}
        for i, (t, y) in texts.items():
            bs = feats[i]
            if not bs:
                continue  # no features -> no gradient contribution
            n = len(bs)
            margin = sum(w.get(b, 0.0) for b in bs) / n
            p = 1.0 / (1.0 + math.exp(-margin))
            for b in bs:
                grad[b] = grad.get(b, 0.0) + (p - y) / n
        for b, g in grad.items():
            w[b] = w.get(b, 0.0) - LR * g / m
    want = {b: round(v, 6) + 0.0 for b, v in w.items()}
    assert set(got) == set(want)
    for b in want:
        assert abs(got[b] - want[b]) <= 2e-6, (b, got[b], want[b])

    # the trained table separates the classes through the inference op
    weights = spark.createDataFrame(
        sorted(got.items()), "bucket long, wt double"
    )
    probs = {
        r["doc_id"]: r["prob"]
        for r in corpus.hashed_classifier_score(
            docs, weights, "text", "doc_id", B
        ).collect()
    }
    pos = [probs[i] for i, (t, y) in texts.items() if y == 1.0 and i in probs]
    neg = [probs[i] for i, (t, y) in texts.items() if y == 0.0]
    assert min(pos) > max(neg)

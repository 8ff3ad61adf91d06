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

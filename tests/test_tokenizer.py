"""Distributed BPE: merge sequence must equal a single-node reference
implementation (Sennrich et al. 2016 algorithm 1), invariant to
partitioning; encode applies merges rank-first."""

from __future__ import annotations

import re
from collections import Counter

from learn_hbase_spark.operators import tokenizer as tk

CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest"),
    (4, "widest widest widest"),
]


def _reference_bpe(texts: list[str], n_merges: int, min_freq: int = 2):
    """Single-node BPE trainer (dict-of-words formulation)."""
    vocab: Counter = Counter()
    for t in texts:
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        for w in norm.split(" "):
            if w:
                vocab[tuple(list(w) + [tk.END_OF_WORD])] += 1
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        if not pairs:
            break
        # max count, lexicographic tiebreak — same rule as the Spark path
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        (a, b) = best[0]
        merges.append((a, b))
        new_vocab: Counter = Counter()
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


def _corpus_df(spark, n_parts=None):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    return df.repartition(n_parts) if n_parts else df


def test_bpe_train_matches_single_node_reference(spark):
    got = tk.bpe_train(_corpus_df(spark), n_merges=10)
    want = _reference_bpe([t for _, t in CORPUS], n_merges=10)
    assert got == want


def test_bpe_train_partition_invariant(spark):
    a = tk.bpe_train(_corpus_df(spark, 1), n_merges=6)
    b = tk.bpe_train(_corpus_df(spark, 7), n_merges=6)
    assert a == b


def test_bpe_encode_rank_priority_and_counts(spark):
    df = _corpus_df(spark)
    merges = tk.bpe_train(df, n_merges=10)
    enc = {r["doc_id"]: r for r in tk.bpe_encode(df, merges).collect()}
    # 'low' fully merges into one token per occurrence
    assert enc[1]["tokens"] == ["low</w>"] * 5
    assert enc[1]["n_tokens"] == 5
    # every token stream reconstructs the normalized text
    for doc_id, text in CORPUS:
        norm = re.sub(r"\s+", " ", text.lower()).strip().replace(" ", "")
        joined = "".join(enc[doc_id]["tokens"]).replace(tk.END_OF_WORD, "")
        assert joined == norm


def test_bpe_train_df_artifact_shape(spark):
    art = tk.bpe_train_df(_corpus_df(spark), n_merges=4).collect()
    assert [r["rank"] for r in art] == list(range(len(art)))
    for r in art:
        assert r["merged"] == r["left"] + r["right"]


def test_bpe_apply_priority_equals_inorder_for_derivation_ordered(spark):
    """The bpe_apply_fixed oracle replays the encoder as SEQUENTIAL
    in-order replace-alls, while production bpe_encode runs the classic
    rank-priority loop. The two agree exactly when every compound symbol
    in a rule is produced by an earlier rule (true of any learned list and
    of _BPE_FIXED_MERGES): applying rule k can only create pairs for rules
    > k, so the priority loop never revisits an earlier rank. Pin that
    equivalence on adversarial words — overlap chains, repeated symbols,
    stacked merges."""
    from learn_hbase_spark.operators.tokenizer import END_OF_WORD, bpe_encode
    from learn_hbase_spark.queries import _BPE_FIXED_MERGES

    def inorder_reference(word, merges):
        syms = list(word) + [END_OF_WORD]
        for a, b in merges:  # each rule: left-to-right non-overlapping sweep
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    words = [
        "the", "then", "there", "and", "hand", "in", "inn", "thin",
        "ananan", "anand", "thethe", "ththe", "ander", "onion",
        "a", "t", "", "x",
        # stacked-merge stress under a chain list
        "aaa", "aaaa", "abab",
    ]
    chain = [("a", "a"), ("aa", "a"), ("a", "b"), ("ab", "ab")]
    for merges in (_BPE_FIXED_MERGES, chain):
        df = spark.createDataFrame(
            [(i, w) for i, w in enumerate(words) if w],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: list(r["tokens"])
            for r in bpe_encode(df, merges).collect()
        }
        for i, w in enumerate(words):
            if not w:
                continue
            assert got[i] == inorder_reference(w, merges), (w, merges)

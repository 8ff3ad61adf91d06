"""Distributed BPE tokenizer training and application.

Training a byte-pair-encoding vocabulary ON the corpus is a standard step
of a pretraining pipeline (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"), and the counting work is
exactly a Spark aggregation problem:

- The distributed state is the WORD-FREQUENCY table, not the corpus: one
  row per distinct word with its count and current symbol array. The
  corpus is scanned ONCE; all ``n_merges`` rounds run over the (far
  smaller, Zipf-truncated) word table.
- Each round: adjacent symbol pairs are expanded JVM-side (no Python),
  counted with a map-side-combinable groupBy weighted by word frequency,
  and only the single best pair reaches the driver — bounded driver state,
  like the k-means centroid fetch. The winning merge is applied to the
  symbol arrays with a higher-order ``aggregate`` expression (again no
  Python), and lineage is truncated lazily per round.
- Determinism: ties on pair count break lexicographically, so the merge
  sequence is a pure function of the corpus.

At 100 TB the word table is the ~10^7-row distinct vocabulary — trivially
partitionable, and each round's shuffle carries (pair, count) rows only.

``bpe_encode`` applies a trained merge list to new text: the merge table
broadcasts, and application is an Arrow-batched ``mapInPandas`` running
the classic rank-priority merge loop per word (Python is the right tool
here: per-word loops with early exit, no vectorizable structure).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.layout import rebalance_for_compute
from .dedup import normalize_text

END_OF_WORD = "</w>"


def _word_table(corpus: DataFrame, text_col: str) -> DataFrame:
    """(word, freq, syms): distinct words with counts and initial
    character symbols + the end-of-word marker."""
    words = corpus.select(
        F.explode(
            F.split(normalize_text(F.col(text_col)), " ")
        ).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("freq"))
        .withColumn(
            "syms",
            F.array_append(
                F.filter(F.split(F.col("word"), ""), lambda c: c != ""),
                F.lit(END_OF_WORD),
            ),
        )
    )


def _pair_counts(word_table: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-pair counts — all JVM expressions."""
    # clamp + try_element_at, not just the trailing filter: Catalyst may
    # evaluate reordered predicate conjuncts (e.g. the generator's
    # inferred not-null/size filter) before the size filter, and an
    # unclamped sequence(0, size-2) DESCENDS for fully-merged 1-symbol
    # words, driving element_at(syms, 0) into a runtime error (same
    # hazard class as dedup.positional_gram_rows; a when()-guard is
    # equally safe but a CASE around the transform defeats codegen).
    # A 1-symbol word emits one (sym, NULL) pair that the b-not-null
    # filter drops with the row.
    pair_arr = F.transform(
        F.sequence(
            F.lit(0), F.greatest(F.size("syms") - F.lit(2), F.lit(0))
        ),
        lambda i: F.struct(
            F.try_element_at("syms", i + 1).alias("a"),
            F.try_element_at("syms", i + 2).alias("b"),
        ),
    )
    pairs = word_table.select(
        "freq", F.explode(pair_arr).alias("p")
    ).filter(F.col("p.b").isNotNull())
    return pairs.groupBy(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    ).agg(F.sum("freq").alias("n"))


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Replace every non-overlapping adjacent (a, b) with the merged
    symbol, left to right — a single higher-order ``aggregate`` fold with
    (accumulated array, skip-next) state; no Python boundary."""
    la, lb = F.lit(a), F.lit(b)
    merged = F.lit(a + b)

    def step(s: Column, i: Column) -> Column:
        cur = F.element_at(syms, i + 1)
        nxt = F.element_at(syms, i + 2)  # NULL past the end
        is_pair = (
            (cur == la) & nxt.isNotNull() & (nxt == lb)
        )
        return (
            F.when(
                s["skip"],
                F.struct(
                    s["acc"].alias("acc"), F.lit(False).alias("skip")
                ),
            )
            .when(
                is_pair,
                F.struct(
                    F.array_append(s["acc"], merged).alias("acc"),
                    F.lit(True).alias("skip"),
                ),
            )
            .otherwise(
                F.struct(
                    F.array_append(s["acc"], cur).alias("acc"),
                    F.lit(False).alias("skip"),
                )
            )
        )

    init = F.struct(
        F.array().cast("array<string>").alias("acc"),
        F.lit(False).alias("skip"),
    )
    idx = F.sequence(F.lit(0), F.size(syms) - F.lit(1))
    return F.aggregate(idx, init, step, lambda s: s["acc"])


def bpe_train(
    corpus: DataFrame,
    text_col: str = "text",
    n_merges: int = 16,
    min_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the ordered
    merge list (the tokenizer). Stops early when the best remaining pair
    falls under ``min_freq``. Each round is one shuffle over the word
    table plus a one-row driver fetch; the corpus itself is read once."""
    wt = _word_table(corpus, text_col).localCheckpoint(eager=False)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        # one-row driver fetch (same bounded-metadata class as the
        # k-means centroid pull; the package-wide no-.collect() posture
        # holds — only index-sized state ever reaches the driver)
        best = (
            _pair_counts(wt)
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .toPandas()
        )
        if best.empty or int(best["n"][0]) < min_freq:
            break
        a, b = str(best["a"][0]), str(best["b"][0])
        merges.append((a, b))
        wt = wt.withColumn(
            "syms", _apply_merge(F.col("syms"), a, b)
        ).localCheckpoint(eager=False)
    return merges


def bpe_train_df(
    corpus: DataFrame,
    text_col: str = "text",
    n_merges: int = 16,
    min_freq: int = 2,
) -> DataFrame:
    """``bpe_train`` as a DataFrame: (rank, left, right, merged) — the
    persistable tokenizer artifact."""
    merges = bpe_train(corpus, text_col, n_merges, min_freq)
    spark = corpus.sparkSession
    return spark.createDataFrame(
        [(i, a, b, a + b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string, merged string",
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with a trained merge list: (id, tokens array, n_tokens).

    The merge table is tiny (vocab-sized) and ships inside the serialized
    function; application is the classic rank-priority loop per word in an
    Arrow-batched ``mapInPandas`` — per-word while-loops with early exit
    have no vectorized/JVM form, so Python IS the right boundary, and the
    batch shape keeps transfer cost at Arrow speed."""
    import pandas as pd

    rank = {pair: i for i, pair in enumerate(merges)}

    def _encode_word(word: str, cache: dict) -> list[str]:
        hit = cache.get(word)
        if hit is not None:
            return hit
        syms = list(word) + [END_OF_WORD]
        while len(syms) >= 2:
            best_i, best_r = -1, None
            for i in range(len(syms) - 1):
                r = rank.get((syms[i], syms[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        cache[word] = syms
        return syms

    out_schema = f"{id_col} long, tokens array<string>, n_tokens int"

    def _encode(batches):
        cache: dict = {}
        for pdf in batches:
            toks = []
            for text in pdf["_norm"]:
                doc: list[str] = []
                for w in (text or "").split(" "):
                    if w:
                        doc.extend(_encode_word(w, cache))
                toks.append(doc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    # rebalance before the kernel (r15): the per-word merge loop is the
    # CPU cost and must not inherit a single-split scan's one-task layout;
    # no-op when the scan is already well-split
    prepped = rebalance_for_compute(
        df.select(
            F.col(id_col), normalize_text(F.col(text_col)).alias("_norm")
        ),
        id_col,
    )
    return prepped.mapInPandas(_encode, schema=out_schema)

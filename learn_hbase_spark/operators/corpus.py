"""Corpus-level statistics operators (LLM-pipeline extensions, SURVEY §7.2 M4).

Whole-corpus text analytics that need aggregation state across documents:
TF-IDF salient terms and exact distribution profiles. Everything is built-in
expression + aggregate + window — no Python in the hot path — and every
shuffle carries token- or scalar-sized rows, never document bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.layout import rebalance_for_compute
from .dedup import normalize_text


def tfidf_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-k salient terms per document by smoothed TF-IDF
    (``tf * (ln((N+1)/(df+1)) + 1)``, the scikit-learn smoothing).

    Returns ``(id, term, tf, df, rank)``. Ranking ties are broken by
    ``(tf desc, df asc, term asc)`` — an integer-only ordering equivalent to
    score order at equal tf, so results are deterministic across engines
    (float score ordering is engine-rounding-sensitive; integer ranking is
    not). The float score itself stays available from tf/df downstream.

    Scale: two token-keyed shuffles (per-doc term counts, then document
    frequency) and one window over (id). The df side aggregates to one row
    per distinct term — at 100 TB that is vocabulary-sized, and the join
    back to term counts is a plain shuffled hash join on the term key (or a
    broadcast if the vocabulary fits).
    """
    tokens = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias(
                "term"
            ),
        )
        .filter(F.col("term") != "")
    )
    tf = tokens.groupBy("_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(dfreq, "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_id").alias(id_col), "term", "tf", "df", "rank")
    )


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Data-quality audit: one row per column with ``(column, n, n_null,
    n_distinct, min_s, max_s)`` — min/max compared as strings so every type
    profiles uniformly.

    All columns are profiled in a single pass: one aggregate over the table
    computes every per-column statistic, then a constant-width stack
    (unpivot) reshapes to long form. At 100 TB this is one scan + one
    map-side-combined aggregation to a single row — no per-column jobs, no
    driver loop over columns.
    """
    cols = cols or df.columns
    aggs = []
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(s).alias(f"__mn_{c}"),
            F.max(s).alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    stacked = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(f"__n_{c}").alias("n"),
                    F.col(f"__nn_{c}").alias("n_null"),
                    F.col(f"__nd_{c}").alias("n_distinct"),
                    F.col(f"__mn_{c}").alias("min_s"),
                    F.col(f"__mx_{c}").alias("max_s"),
                )
                for c in cols
            ]
        )
    ).alias("p")
    return one.select(stacked).select("p.*")


def length_profile(
    df: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact per-group distribution profile: min / p10 / p50 / p90 / max /
    count of ``value_col``, with discrete (no-interpolation) percentiles.

    Percentile-k is the value at ``row_number == ceil(q * n)`` under a
    deterministic ``(value, id)`` sort — the classic sort-based exact
    quantile, reproducible bit-for-bit in any engine (interpolating
    quantiles are float-arithmetic-order sensitive; discrete ones are not).

    Scale: one shuffle on the group key; the window sorts within each
    group's partitions. For heavy-tailed group sizes at 100 TB switch to
    ``approx_percentile`` (t-digest) — this exact form is the oracle-able
    reference implementation.
    """
    w = Window.partitionBy(group_col).orderBy(F.col(value_col), F.col(id_col))
    ranked = (
        df.select(group_col, value_col, id_col)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(Window.partitionBy(group_col)))
    )
    pick = lambda q: F.max(  # noqa: E731 — local aggregate builder
        F.when(
            F.col("_rn") == F.ceil(F.lit(q) * F.col("_n")), F.col(value_col)
        )
    )
    return ranked.groupBy(group_col).agg(
        F.min(value_col).alias("v_min"),
        pick(0.10).alias("p10"),
        pick(0.50).alias("p50"),
        pick(0.90).alias("p90"),
        F.max(value_col).alias("v_max"),
        F.count("*").alias("n"),
    )


BOS = "<s>"


def _bigram_pairs(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, w1, w2) BOS-conditioned bigram rows of normalized text — the
    shared extraction of :func:`bigram_lm_score` (self-trained) and
    :func:`bigram_lm_score_frozen` (frozen reference model), so the two
    scorers can never disagree on tokenization."""
    arr = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda w: w != ""
    )
    docs = rebalance_for_compute(
        df.select(
            F.col(id_col).alias("_id"),
            F.concat(F.array(F.lit(BOS)), arr).alias("_a"),
        ).filter(F.size("_a") >= 2),
        "_id",
    )
    big = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size("_a") - 2, F.lit(0))),
        lambda i: F.struct(
            F.try_element_at("_a", i + 1).alias("w1"),
            F.try_element_at("_a", i + 2).alias("w2"),
        ),
    )
    return (
        docs.select("_id", F.explode(big).alias("_p"))
        .select("_id", F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
        .filter(F.col("w2").isNotNull())
    )


def bigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
) -> DataFrame:
    """Bigram language-model scoring with add-k smoothing: per-document
    mean log-probability under the corpus's own bigram distribution — the
    CCNet-style quality filter (Wenzek et al. 2020 score with a KenLM
    n-gram model; this is the n=2 member of that family, trained ON the
    corpus like the unigram ``lm_score`` query), one order stronger than
    unigram scoring because it penalizes improbable word ORDER, not just
    rare words.

    ``P(w2|w1) = (C(w1,w2) + k) / (C(w1) + k·V)`` with ``V`` = distinct
    corpus tokens; every document is prefixed with a ``<s>`` marker so its
    first token is conditioned too. Scoring the corpus under its own
    counts means every scored bigram exists in the tables (inner joins,
    no missing-key branch); scoring NEW text against a frozen table would
    left-join with ``C=0``.

    Scale: bigram/context counts are two partial-aggregable shuffles over
    (token-pair, count) rows — Zipf-truncated, far smaller than the
    corpus; the per-doc score join keys on the bigram (broadcast or
    shuffled, Catalyst's choice by size); ``V`` rides a one-row broadcast
    cross join (bounded build side — the allowlisted NLJ class). Returns
    ``(id, n_bigrams, avg_logprob)``; logprob rounded to 6 (same
    cross-engine float posture as ``lm_score``: identical double ratios
    into ``ln``, summation ulps ~1e-15 against a 1e-6 grid).
    """
    # ONE normalize/split pass (r15 optimization): the pair extraction's
    # rebalance exchange (inside _bigram_pairs) is the shared subtree both
    # remaining consumers — the c2 count fit and the per-doc score —
    # reuse at runtime, so the text is normalized and tokenized once (the
    # post-exchange explode re-runs per consumer, a cheap generator over
    # already-split word arrays); c1 and V derive from c2 by exact
    # integer aggregation (C(w1) = Σ_w2 C(w1,w2), V = |distinct w2 keys|
    # — the identities freeze_bigram_lm already relies on), removing the
    # other two of the original FOUR independent extraction lineages.
    pairs = _bigram_pairs(df, text_col, id_col)
    c2 = pairs.groupBy("w1", "w2").agg(F.count("*").alias("_c2"))
    c1 = c2.groupBy("w1").agg(F.sum("_c2").alias("_c1"))
    # V = distinct real tokens: every token occurrence appears as w2
    # (BOS-prefixing makes position 1..n all right-hand sides)
    vocab_n = c2.select("w2").distinct().agg(
        F.count("*").alias("_v")
    )
    logp = F.log(
        (F.col("_c2") + F.lit(float(k)))
        / (F.col("_c1") + F.lit(float(k)) * F.col("_v"))
    )
    return (
        pairs.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab_n))
        .groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(logp), 6).alias("avg_logprob"),
        )
    )


def bigram_lm_score_frozen(
    docs: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
) -> DataFrame:
    """Score ``docs`` under a bigram LM trained on a SEPARATE reference
    corpus ``model`` — the actual CCNet deployment shape (Wenzek et al.
    2020: the KenLM model is trained on Wikipedia, then scores the
    crawl). Unlike :func:`bigram_lm_score` (self-trained, inner joins),
    the crawl contains bigrams and contexts the model never saw, so the
    count joins are LEFT with ``C = 0`` fallbacks and add-k smoothing
    supplies the floor probability: an unseen bigram under a seen context
    scores ``k / (C(w1) + k·V)``; a wholly unseen context scores
    ``1 / V``. V = the MODEL's vocabulary (distinct right-hand tokens),
    exactly the self-trained definition.

    Scale: identical to the self-trained scorer — the model-side count
    tables are Zipf-truncated (token-pair, count) rows joined to the
    crawl's bigram stream by key (broadcast when the reference corpus is
    small — the usual case — else shuffled, Catalyst's size-based
    choice); V rides a one-row broadcast. Same float posture: exact
    integer ratios into ``ln``, average rounded to 6.
    Returns ``(id, n_bigrams, avg_logprob)``.
    """
    c2, c1, vocab_n = _bigram_lm_tables(model, text_col, id_col)
    return bigram_lm_score_tables(docs, c2, c1, vocab_n, text_col, id_col, k)


def _bigram_lm_tables(
    model: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The three frozen-model count tables of a bigram LM — bigram counts
    ``(w1, w2, _c2)``, context counts ``(w1, _c1)``, and the one-row
    vocabulary size ``(_v)`` — shared by :func:`bigram_lm_score_frozen`
    (tables derived inline from a model frame) and
    :func:`freeze_bigram_lm` (tables materialized to parquet for
    train-once / deploy-many callers like the streaming drop zone), so
    the two deployment shapes cannot drift."""
    # one extraction pass: c1 and V derive from c2 by exact integer
    # aggregation (the freeze_bigram_lm identities) instead of re-running
    # the pair extraction per table (r15 optimization)
    mp = _bigram_pairs(model, text_col, id_col)
    c2 = mp.groupBy("w1", "w2").agg(F.count("*").alias("_c2"))
    c1 = c2.groupBy("w1").agg(F.sum("_c2").alias("_c1"))
    vocab_n = c2.select("w2").distinct().agg(F.count("*").alias("_v"))
    return c2, c1, vocab_n


def bigram_lm_score_tables(
    docs: DataFrame,
    c2: DataFrame,
    c1: DataFrame,
    vocab_n: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
) -> DataFrame:
    """Score ``docs`` against pre-built bigram-LM count tables — the
    scoring body of :func:`bigram_lm_score_frozen`, split out so a
    MATERIALIZED model (:func:`freeze_bigram_lm` → :func:`load_bigram_lm`)
    scores through the exact same left-join/smoothing expressions as an
    inline model frame. Same semantics and float posture as the frozen
    scorer: LEFT joins with ``C = 0`` fallbacks, add-k floor
    probabilities, round-6 average."""
    dp = _bigram_pairs(docs, text_col, id_col)
    logp = F.log(
        (F.coalesce(F.col("_c2"), F.lit(0)) + F.lit(float(k)))
        / (F.coalesce(F.col("_c1"), F.lit(0)) + F.lit(float(k)) * F.col("_v"))
    )
    return (
        dp.join(c2, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(vocab_n))
        .groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(logp), 6).alias("avg_logprob"),
        )
    )


def freeze_bigram_lm(
    model: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
    threshold_quantile: float | None = None,
) -> float | None:
    """Train ONCE, deploy many: materialize a bigram LM's count tables
    (and optionally a frozen keep-threshold) to parquet under ``path`` —
    the deployment artifact the streaming drop zone scores against
    (``streaming.events.curation_ingest_file_stream``'s frozen band). A
    micro-batch cannot train the model that judges it (self-trained
    thresholds drift per drain); the production shape is CCNet's (Wenzek
    2020): the model is fitted on a frozen reference corpus offline, and
    every future batch is scored under it, so a document's verdict is a
    deterministic content property independent of batch composition.

    Layout: ``{path}/c2`` (bigram counts), ``{path}/c1`` (context
    counts), ``{path}/meta`` (one row: vocabulary size ``_v``, smoothing
    ``_k``, threshold ``_thr``). With ``threshold_quantile`` the
    reference corpus is scored under its own frozen tables
    (:func:`bigram_lm_score` — identical by construction, every bigram
    seen) and the round-4 exact percentile of those round-6 scores is
    stored as ``_thr`` (the quality_band_sample parity posture), giving
    deploy-time callers a calibrated absolute cutoff. Returns ``_thr``.

    Scale: the count tables are Zipf-truncated (pair, count) rows — far
    smaller than the reference corpus; the threshold is one exact
    `percentile` aggregate (state bounded by distinct round-6 scores).
    The corpus-side gram extraction runs at most TWICE: once into the
    ``c2`` write, once (only with ``threshold_quantile``) to score the
    corpus for calibration — ``c1`` re-aggregates the written ``c2``
    parquet (``C(w1) = Σ_w2 C(w1,w2)`` exactly, integer sums) and the
    vocabulary count scans it too, never the corpus again, and the
    calibration scores through the WRITTEN tables
    (:func:`bigram_lm_score_tables`; for the model's own pairs every
    left join matches, so the scores equal the self-trained form
    expression-for-expression).
    """
    mp = _bigram_pairs(model, text_col, id_col)
    mp.groupBy("w1", "w2").agg(F.count("*").alias("_c2")).write.mode(
        "overwrite"
    ).parquet(f"{path}/c2")
    spark = model.sparkSession
    c2 = spark.read.parquet(f"{path}/c2")
    c2.groupBy("w1").agg(F.sum("_c2").alias("_c1")).write.mode(
        "overwrite"
    ).parquet(f"{path}/c1")
    c1 = spark.read.parquet(f"{path}/c1")
    vocab_n = c2.select("w2").distinct().agg(F.count("*").alias("_v"))
    thr = None
    if threshold_quantile is not None:
        thr = (
            bigram_lm_score_tables(
                model, c2, c1, vocab_n, text_col, id_col, k
            )
            .agg(
                F.round(
                    F.expr(f"percentile(avg_logprob, {threshold_quantile})"),
                    4,
                ).alias("_thr")
            )
            .collect()[0]["_thr"]
        )
        thr = float(thr) if thr is not None else None
    vocab_n.select(
        "_v", F.lit(float(k)).alias("_k"),
        F.lit(thr).cast("double").alias("_thr"),
    ).write.mode("overwrite").parquet(f"{path}/meta")
    return thr


def load_bigram_lm(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame, float, float | None]:
    """Load a :func:`freeze_bigram_lm` artifact: returns ``(c2, c1,
    vocab_n, k, threshold)`` ready for :func:`bigram_lm_score_tables`.
    The count-table reads are lazy scans (re-planned per caller, e.g.
    per micro-batch — cheap, the tables are Zipf-truncated and Catalyst
    broadcasts them); only the one-row meta frame is collected."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    c2 = spark.read.parquet(f"{path}/c2")
    c1 = spark.read.parquet(f"{path}/c1")
    vocab_n = spark.createDataFrame([(meta["_v"],)], "_v long")
    thr = meta["_thr"]
    return c2, c1, vocab_n, float(meta["_k"]), (
        float(thr) if thr is not None else None
    )


def hashed_gram_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
) -> DataFrame:
    """Hashed n-gram featurization (Xie et al. 2023 "DSIR" §3; also the
    fastText feature map, Joulin et al. 2017): every unigram and adjacent
    word bigram of the normalized text hashes into one of ``buckets``
    integer feature ids. Returns one ``(id, bucket)`` row per gram
    OCCURRENCE (a bag, not a set — downstream counts are frequencies).

    The hash is the md5-hex family shared with the sampling/simhash
    operators (first 6 hex chars parsed base-16, mod ``buckets``) so a
    DuckDB oracle reproduces bucket ids bit-for-bit; tokenization is
    :func:`~learn_hbase_spark.operators.dedup.normalize_text` + split,
    identical to every other corpus operator.

    Scale: pure scan → explode projection, no shuffle here; the bucket
    space bounds every downstream aggregate at ``buckets`` rows no matter
    the corpus size — that is the entire point of hashed features at
    100 TB (vocabulary-sized state would be unbounded; bucket state is a
    constant ~10k rows).

    ONE scan and ONE explode: unigrams and bigrams are concatenated into
    a single per-doc gram array before the explode (a union of two
    exploded projections reads + normalizes the text twice — measured in
    the r15 optimization pass; same multiset either way).
    """
    arr = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda w: w != ""
    )
    docs = rebalance_for_compute(
        df.select(F.col(id_col).alias("_id"), arr.alias("_a")), "_id"
    )
    # size>=2 guard BEFORE sequence(): Spark's sequence(1, 0) infers a
    # descending step and yields [1, 0] instead of the empty array
    bi_arr = F.transform(
        F.sequence(F.lit(1), F.size("_a") - 1),
        lambda i: F.concat_ws(
            " ", F.try_element_at("_a", i), F.try_element_at("_a", i + 1)
        ),
    )
    grams = F.when(
        F.size("_a") >= 2, F.concat(F.col("_a"), bi_arr)
    ).otherwise(F.col("_a"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("_g")), 1, 6), 16, 10).cast("long")
        % F.lit(int(buckets))
    )
    return docs.select("_id", F.explode(grams).alias("_g")).select(
        F.col("_id").alias(id_col), bucket.alias("bucket")
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
    k: float = 1.0,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): fit bag-of-hashed-ngram
    unigram distributions over the ``target`` domain (the corpus you WANT
    more of — e.g. Wikipedia) and the ``raw`` pool (the crawl), then
    weight every raw document by its log importance ratio

        log w(z) = sum_g [ ln p_target(bucket(g)) - ln p_raw(bucket(g)) ]

    summed over the document's gram occurrences, with add-``k`` smoothing
    ``(c_j + k) / (N + k * buckets)`` on both distributions so
    target-unseen buckets get a floor instead of -inf. High-weight
    documents look like the target domain; resampling by this weight
    (:func:`dsir_select`) is the published recipe for pretraining-data
    selection toward a domain.

    Scale: the two distribution fits are partial-aggregable counts keyed
    on the bucket id — state bounded at ``buckets`` rows each regardless
    of corpus size. The per-bucket log-ratio table (<= ``buckets`` rows)
    broadcasts to the raw gram stream; the only other shuffle is the
    per-doc sum. Totals ride one-row broadcast cross joins (the
    allowlisted bounded-NLJ class). Returns ``(id, n_grams,
    log_weight)``; sum rounded to 6 (identical integer counts feed ln in
    both engines; summation ulps ~1e-12 against the 1e-6 grid).

    One pass per corpus (r15 optimization): the raw gram stream is
    pre-aggregated to (id, bucket, count) rows behind a single exchange
    that BOTH consumers (the bucket-count fit and the per-doc score)
    reuse — the original three independent consumers of the raw gram
    lineage (fit, total, score) re-ran the scan + normalize + md5
    extraction three times (and the target side twice); the totals are
    now exact integer sums of the fit tables (``Σ_bucket c = N``) and
    the per-doc log-weight is the count-weighted sum over distinct
    (id, bucket) rows — the same multiset of addends up to float
    summation order, which both engines already tolerate (round-6 grid
    vs ~1e-12 ulps).
    """
    tc = (
        hashed_gram_buckets(target, text_col, id_col, buckets)
        .groupBy("bucket")
        .agg(F.count("*").alias("_tc"))
    )
    rgc = (
        hashed_gram_buckets(raw, text_col, id_col, buckets)
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("_cn"))
    )
    rc = rgc.groupBy("bucket").agg(F.sum("_cn").alias("_rc"))
    # coalesce to 0 (ADVICE r15): sum over an EMPTY fit table is NULL
    # where the pre-r15 count(*) form returned 0 — without it a
    # zero-gram corpus would make the smoothed ratios NULL instead of
    # the finite add-k values
    tn = tc.agg(F.coalesce(F.sum("_tc"), F.lit(0)).alias("_tn"))
    rn = rc.agg(F.coalesce(F.sum("_rc"), F.lit(0)).alias("_rn"))
    kk = F.lit(float(k))
    kb = F.lit(float(k) * buckets)
    # every scored bucket exists in rc (the scored docs ARE the raw fit
    # corpus), so rc is the spine and only the target side needs a
    # missing-bucket fallback
    ratios = (
        rc.join(tc, "bucket", "left")
        .crossJoin(F.broadcast(tn))
        .crossJoin(F.broadcast(rn))
        .select(
            "bucket",
            (
                F.log((F.coalesce(F.col("_tc"), F.lit(0)) + kk) / (F.col("_tn") + kb))
                - F.log((F.col("_rc") + kk) / (F.col("_rn") + kb))
            ).alias("_lr"),
        )
    )
    return (
        rgc.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("_cn").alias("n_grams"),
            F.round(F.sum(F.col("_cn") * F.col("_lr")), 6).alias("log_weight"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
    k: float = 1.0,
    keep_frac: float = 0.25,
    approx_threshold: bool = False,
) -> DataFrame:
    """The DSIR selection step: keep the top ``keep_frac`` of the raw
    pool by importance weight. The paper resamples with Gumbel noise;
    this takes the deterministic top-quantile variant (the noise-free
    limit) so the selection is engine-replayable — the threshold is the
    ``1 - keep_frac`` quantile of the rounded weights, rounded to 4
    (the ``quality_band_sample`` cross-engine posture: both engines
    interpolate the same rounded-6 scores, so every keep/drop call
    agrees). Threshold comparison is ``>=``, so ties at the boundary are
    kept — the conservative (keep-more) direction.

    Scale: :func:`dsir_weights` plus one grouped-aggregate quantile over
    (weight) scalars and a one-row threshold broadcast — no new
    corpus-sized state. MEMORY BOUND of the default exact ``percentile``:
    Spark buffers a (value -> count) map, so the final aggregation task
    holds O(distinct scores) — bounded here because ``dsir_weights``
    rounds to 6 BEFORE the quantile (<= 2e6 distinct values per unit of
    score range; see SCALE.md "Exact-percentile thresholds"), NOT by row
    count. ``approx_threshold=True`` switches to ``approx_percentile``
    (KLL sketch, fixed ~10k-element state regardless of the score
    distribution) for corpora whose score span makes even the rounded
    grid large; the threshold then differs from exact by at most the
    sketch's rank error, which only moves docs whose weight sits within
    that band of the cut.
    """
    w = dsir_weights(raw, target, text_col, id_col, buckets, k)
    fn = "approx_percentile" if approx_threshold else "percentile"
    thr = w.agg(
        F.round(
            F.expr(f"{fn}(log_weight, {1.0 - keep_frac})"), 4
        ).alias("_thr")
    )
    return (
        w.crossJoin(F.broadcast(thr))
        .filter(F.col("log_weight") >= F.col("_thr"))
        .select(id_col, "n_grams", "log_weight")
    )


def dsir_weights_frozen(
    new: DataFrame,
    target: DataFrame,
    raw_ref: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
    k: float = 1.0,
) -> DataFrame:
    """DSIR importance weights in the FROZEN-distribution deployment
    form — the :func:`bigram_lm_score_frozen` posture applied to DSIR:
    both hashed-ngram distributions are fitted ONCE, on a frozen target
    reference and a frozen raw-pool reference, and each NEW crawl batch
    is scored against them without refitting. :func:`dsir_weights` (the
    paper's one-shot form) fits the raw distribution on the very pool it
    scores — right for a single selection pass, wrong for an ingest
    pipeline where weights must be stable across batches and scoring
    must be O(new), never O(corpus).

    Because the scored stream is no longer the fit corpus, buckets can
    be absent from EITHER reference: both sides take the add-``k``
    smoothing floor via LEFT joins with ``coalesce(c, 0)`` (a bucket
    unseen in both references contributes the constant
    ``ln((rn+kB)/(tn+kB))`` per occurrence — no information either way).

    Scale: the two reference fits are one-time ``buckets``-bounded
    counts; per batch, BOTH count tables broadcast (<= ``buckets`` rows
    each) onto the new batch's gram stream and the only shuffle is the
    per-doc sum — O(new) per batch at any corpus size. Returns
    ``(id, n_grams, log_weight)``, round-6 like :func:`dsir_weights`.
    """
    # totals are exact integer sums of the fit tables (Σ_bucket c = N),
    # so each reference corpus is scanned + gram-extracted ONCE (the
    # separate count(*) totals re-ran the extraction — r15 optimization)
    ng = hashed_gram_buckets(new, text_col, id_col, buckets)
    tc = (
        hashed_gram_buckets(target, text_col, id_col, buckets)
        .groupBy("bucket")
        .agg(F.count("*").alias("_tc"))
    )
    rc = (
        hashed_gram_buckets(raw_ref, text_col, id_col, buckets)
        .groupBy("bucket")
        .agg(F.count("*").alias("_rc"))
    )
    # coalesce to 0 (ADVICE r15): an empty reference corpus must yield
    # the finite add-k floor, not NULL ratios (sum over empty = NULL)
    tn = tc.agg(F.coalesce(F.sum("_tc"), F.lit(0)).alias("_tn"))
    rn = rc.agg(F.coalesce(F.sum("_rc"), F.lit(0)).alias("_rn"))
    kk = F.lit(float(k))
    kb = F.lit(float(k) * buckets)
    lr = F.log(
        (F.coalesce(F.col("_tc"), F.lit(0)) + kk) / (F.col("_tn") + kb)
    ) - F.log(
        (F.coalesce(F.col("_rc"), F.lit(0)) + kk) / (F.col("_rn") + kb)
    )
    return (
        ng.join(F.broadcast(tc), "bucket", "left")
        .join(F.broadcast(rc), "bucket", "left")
        .crossJoin(F.broadcast(tn))
        .crossJoin(F.broadcast(rn))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.round(F.sum(lr), 6).alias("log_weight"),
        )
    )


# Gopher §A1.1 repetition thresholds (Rae et al. 2021, Table A1): the
# maximum fraction of characters allowed in the single most frequent
# n-gram (n=2..4) and in ALL duplicated n-grams (n=5..10).
GOPHER_REP_THRESHOLDS = {
    ("top", 2): 0.20, ("top", 3): 0.18, ("top", 4): 0.16,
    ("dup", 5): 0.15, ("dup", 6): 0.14, ("dup", 7): 0.13,
    ("dup", 8): 0.12, ("dup", 9): 0.11, ("dup", 10): 0.10,
}


def gopher_repetition_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    thresholds: dict[tuple[str, int], float] | None = None,
    widths: tuple[int, ...] = (2, 3, 4, 5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """The Gopher repetition rules (Rae et al. 2021 §A1.1, Table A1) —
    the second half of the published rule set,
    ``functions.text.gopher_quality_flags`` being the first: per
    document, the fraction of characters covered by (a) the single most
    frequent word n-gram for n = 2..4 and (b) all DUPLICATED word
    n-grams (count > 1) for n = 5..10, each compared to the paper's
    threshold. Character coverage is computed as
    ``count x len(gram) / total word chars`` (occurrence-weighted, the
    NeMo-Curator/DataTrove convention; overlapping occurrences are not
    de-overlapped, so pathological self-overlap can exceed 1 — documents
    that degenerate are exactly the ones the rule exists to drop).
    Returns the 9 metrics (round-6), 9 per-rule booleans, and ``pass``.
    Ties for the most frequent n-gram break toward the LONGEST tied gram
    (the largest char fraction — conservative toward dropping), a rule
    both engines apply to the same (count, chars) pairs.

    Scale (r15 optimization — the guide §4.2 shape): the metrics are
    per-DOCUMENT statistics, so they need no shuffle at all — one
    Arrow-batched ``mapInPandas`` kernel computes every width's counts
    per document with vectorized NumPy (factorized word ids,
    sliding-window views, C-speed unique/counts), replacing the previous
    explode → 2-shuffle hash-aggregation plan (9 gram rows per word
    position shuffled twice; measured ~4 µs/gram in JVM expressions vs
    well under 1 µs/gram here, and the exchanges are gone — the plan is
    scan → ArrowEval → project, embarrassingly parallel at any corpus
    size). Tokenization stays in the JVM (``split(trim(text), '\\s+')``,
    the exact expression the oracle replays) so the kernel sees the same
    word arrays; only (id, words) crosses the Python boundary. Grouping
    is by exact gram identity (word-id tuples), which the oracle's
    group-by-gram-text replays exactly (the old path grouped by
    xxhash64(gram) — same answer up to accepted ~1e-19 collisions).
    Docs with fewer than n+1 words have no n-gram rows and report 0.0
    (no repetition possible).

    ``widths`` selects which gram widths to audit (default: the paper's
    full 2..10). Cost is linear in emitted gram volume (~4 µs/gram on
    this engine), so the production sampling knob for a 100 TB run is a
    reduced set such as ``(2, 3, 4, 9)`` — the three top-gram rules plus
    one representative duplicated-gram width — cutting gram volume ~2.2×
    while keeping the rules that fire most often; output columns and the
    ``pass`` conjunction cover only the selected widths.
    """
    if not widths or any(n < 2 or n > 10 for n in widths):
        raise ValueError(f"widths must be a non-empty subset of 2..10: {widths}")
    widths = tuple(sorted(set(widths)))
    top_widths = [n for n in widths if n <= 4]
    dup_widths = [n for n in widths if n >= 5]
    id_type = df.schema[id_col].dataType.simpleString()
    metric_cols = [f"top{n}_char_frac" for n in top_widths] + [
        f"dup{n}_char_frac" for n in dup_widths
    ]
    out_schema = ", ".join(
        [f"_id {id_type}"] + [f"`{c}` double" for c in metric_cols]
    )
    width_list = list(widths)

    def _rep_metrics(batches):
        import numpy as np
        import pandas as pd
        from decimal import Decimal, ROUND_HALF_UP
        from numpy.lib.stride_tricks import sliding_window_view

        six = Decimal("0.000001")

        def r6(x):
            # Spark's round(double, 6): HALF_UP over the shortest decimal
            # representation (BigDecimal.valueOf) — repr() is Python's
            # shortest-roundtrip equivalent
            return float(Decimal(repr(x)).quantize(six, rounding=ROUND_HALF_UP))

        for pdf in batches:
            n_rows = len(pdf)
            out_arrs = {
                c: np.zeros(n_rows, dtype=np.float64) for c in metric_cols
            }
            words_col = pdf["_w"]
            for r in range(n_rows):
                words = words_col.iloc[r]
                if words is None or len(words) < 2:
                    continue
                w_np = np.asarray(words, dtype=object)
                nw = len(w_np)
                lens = np.fromiter(
                    (len(w) for w in w_np), dtype=np.int64, count=nw
                )
                chars = int(lens.sum())
                if chars == 0:
                    continue
                ids = pd.factorize(w_np)[0].astype(np.int64)
                pl = np.concatenate((np.zeros(1, dtype=np.int64), np.cumsum(lens)))
                for n in width_list:
                    if nw < n:
                        continue
                    win = np.ascontiguousarray(sliding_window_view(ids, n))
                    glen = pl[n:] - pl[: nw - n + 1]
                    view = win.view([("", win.dtype)] * n).ravel()
                    _, first, counts = np.unique(
                        view, return_index=True, return_counts=True
                    )
                    g = glen[first]
                    if n <= 4:
                        cmax = int(counts.max())
                        best = int(g[counts == cmax].max())
                        out_arrs[f"top{n}_char_frac"][r] = r6(
                            cmax * best / chars
                        )
                    else:
                        dmask = counts > 1
                        dup = int((counts[dmask] * g[dmask]).sum())
                        if dup:
                            out_arrs[f"dup{n}_char_frac"][r] = r6(dup / chars)
            res = {"_id": pdf["_id"]}
            res.update(out_arrs)
            yield pd.DataFrame(res)

    # CONDITIONAL id-hash rebalance before the kernel (r16, ADVICE r15):
    # the counting is CPU-heavy and must not inherit a single-split
    # scan's ONE task — but the former unconditional repartition also
    # fired on well-split scans, shuffling the whole tokenized corpus
    # and, when the scan had MORE splits than cores, coercing it DOWN to
    # core-count giant partitions (spill risk at 100 TB). The helper's
    # condition makes it a no-op exactly there (functions/layout.py).
    base = rebalance_for_compute(
        df.select(
            F.col(id_col).alias("_id"),
            F.filter(
                F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != ""
            ).alias("_w"),
        ),
        "_id",
    )
    out = base.mapInPandas(_rep_metrics, schema=out_schema)
    flags = repetition_rules(widths, thresholds)
    for name, expr in flags.items():
        out = out.withColumn(name, expr)
    all_ok = F.lit(True)
    for name in flags:
        all_ok = all_ok & F.col(name)
    return out.withColumn("pass", all_ok).withColumnRenamed("_id", id_col)


def repetition_rules(
    widths: tuple[int, ...] = (2, 3, 4, 5, 6, 7, 8, 9, 10),
    thresholds: dict[tuple[str, int], float] | None = None,
) -> dict:
    """The Gopher repetition rule set as boolean expressions over the
    METRIC columns :func:`gopher_repetition_flags` emits
    (``top{n}_char_frac`` for n <= 4, ``dup{n}_char_frac`` for n >= 5) —
    the single source of truth shared by the inline flag operator and
    the signals-table thresholding path
    (``pipeline.curation.curate_from_signals``). Metrics are rounded to
    6 at emission, so re-comparison against a published signals table is
    exact."""
    widths = tuple(sorted(set(widths)))
    thr = dict(GOPHER_REP_THRESHOLDS)
    if thresholds:
        thr.update(thresholds)
    flags = {
        f"ok_top{n}": F.col(f"top{n}_char_frac") <= thr[("top", n)]
        for n in widths
        if n <= 4
    }
    flags.update(
        {
            f"ok_dup{n}": F.col(f"dup{n}_char_frac") <= thr[("dup", n)]
            for n in widths
            if n >= 5
        }
    )
    return flags


def repetition_pass_expr(
    widths: tuple[int, ...] = (2, 3, 4, 5, 6, 7, 8, 9, 10),
    thresholds: dict[tuple[str, int], float] | None = None,
):
    """AND of :func:`repetition_rules` — the ``pass`` conjunction
    evaluated against a signals frame instead of inline."""
    expr = F.lit(True)
    for rule in repetition_rules(widths, thresholds).values():
        expr = expr & rule
    return expr


def dsir_select_gumbel(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
    k: float = 1.0,
    keep_frac: float = 0.25,
    salt: str = "dsir",
    beta: float = 1.0,
) -> DataFrame:
    """The PUBLISHED DSIR selection step (Xie et al. 2023 §3, importance
    resampling): sample without replacement with probability proportional
    to the importance weight via the Gumbel-top-k trick — perturb each
    log-weight with an independent Gumbel(0, ``beta``) draw and take the
    top ``keep_frac``; at ``beta=1`` the argmax distribution is exactly
    weight-proportional sampling (Gumbel-max), at ``beta=0`` the noise
    vanishes and the selection degenerates to :func:`dsir_select`'s
    deterministic top-quantile (pinned by
    ``test_dsir_gumbel_beta0_equals_deterministic``).

    The noise is ENGINE-REPLAYABLE, not pseudo-random state: the uniform
    is derived from ``md5(id || ':' || salt)`` (the
    ``stratified_sample`` identity-hash posture) as
    ``u = (hex32 + 0.5) / 2^32`` — strictly inside (0, 1), so
    ``g = -ln(-ln(u))`` is always finite — and the perturbed key rounds
    to 6 before the same quantile-threshold machinery as
    :func:`dsir_select` (round-4 threshold, ``>=`` keeps boundary ties).
    An external engine replays the whole selection bit-for-bit from the
    same salt; changing ``salt`` draws a fresh resample, which is how
    the paper's repeated-resampling variance estimates run on-engine.

    Scale: :func:`dsir_weights` + a pure projection for the noise + the
    same single quantile aggregate and one-row broadcast — no state
    beyond the exact-percentile buffer (O(distinct rounded keys); see
    SCALE.md "Exact-percentile thresholds"). Returns
    ``(id, n_grams, log_weight, gumbel_key)``.
    """
    w = dsir_weights(raw, target, text_col, id_col, buckets, k)
    return gumbel_topk(w, id_col, keep_frac, salt, beta)


def gumbel_topk(
    weights: DataFrame,
    id_col: str = "doc_id",
    keep_frac: float = 0.25,
    salt: str = "dsir",
    beta: float = 1.0,
    weight_col: str = "log_weight",
) -> DataFrame:
    """The Gumbel-top-k resampling step alone, over ANY per-document
    weight frame — factored out of :func:`dsir_select_gumbel` so the
    frozen-distribution deployment composes it directly
    (``gumbel_topk(dsir_weights_frozen(...))`` — the incremental-crawl
    shape: frozen references score each new batch, Gumbel resampling
    selects within it). Same engine-replayable noise (md5-derived
    uniform, always in (0, 1)), round-6 perturbed key, round-4 exact
    quantile threshold, ``>=`` keeps boundary ties. Returns the input
    columns plus ``gumbel_key``, filtered to the kept top fraction.

    Scale: a pure projection for the noise plus one percentile
    aggregate broadcast back as a one-row frame — no state beyond the
    exact-percentile buffer (O(distinct rounded keys))."""
    for reserved in ("gumbel_key", "_thr"):
        if reserved in weights.columns:
            raise ValueError(
                f"gumbel_topk adds a {reserved!r} column; the input weights "
                f"frame already has one — rename it before resampling"
            )
    h32 = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"), F.lit(":" + salt)
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (h32 + F.lit(0.5)) / F.lit(4294967296.0)
    noisy = F.round(
        F.col(weight_col) + F.lit(float(beta)) * (-F.log(-F.log(u))), 6
    )
    scored = weights.withColumn("gumbel_key", noisy)
    thr = scored.agg(
        F.round(
            F.expr(f"percentile(gumbel_key, {1.0 - keep_frac})"), 4
        ).alias("_thr")
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .filter(F.col("gumbel_key") >= F.col("_thr"))
        .select(*weights.columns, "gumbel_key")
    )


def perplexity_buckets(
    scored: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "avg_logprob",
    strata_col: str = "source",
    lo: float = 0.333333,
    hi: float = 0.666667,
    approx_threshold: bool = False,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3 — the
    published OUTPUT shape of the CCNet pipeline: each language's
    documents are divided into three equal buckets by reference-LM
    perplexity, and downstream consumers pick head, head+middle, or
    all): bucket every document against ITS OWN STRATUM's score
    tertiles, so a low-resource stratum is judged against itself, never
    against the dominant stratum's distribution. ``head`` is the BEST
    bucket (highest mean log-prob = lowest perplexity); boundaries use
    ``>=``, so boundary ties land in the better bucket.

    Feed any per-doc score frame — the registered query feeds the
    unigram LM, the CCNet-faithful composition feeds
    :func:`bigram_lm_score_frozen`. Thresholds are exact per-stratum
    percentiles (round-4) of round-6 scores — the
    quality_band_sample engine-parity posture, and the same
    O(distinct rounded scores) exact-percentile memory bound documented
    in SCALE.md "Exact-percentile thresholds" (one buffer per stratum);
    ``approx_threshold=True`` swaps in ``approx_percentile`` (fixed
    sketch state per stratum) for production corpora with a very wide
    score span — the ``_lm_band_ids`` switch, here per stratum.

    Scale: one partial-aggregable grouped percentile (|strata| rows
    out), broadcast back onto a pure projection — the corpus never
    shuffles. Returns the input plus ``ppl_bucket``; documents whose
    stratum is NULL (no equi-match against the threshold frame) come
    back with the sentinel bucket ``unbucketed`` rather than being
    dropped.
    """
    fn = "approx_percentile" if approx_threshold else "percentile"
    thr = scored.groupBy(strata_col).agg(
        F.round(F.expr(f"{fn}({score_col}, {lo})"), 4).alias("_t1"),
        F.round(F.expr(f"{fn}({score_col}, {hi})"), 4).alias("_t2"),
    )
    bucket = (
        # LEFT join below: a NULL stratum never equi-matches its own
        # threshold row (null-unsafe join keys), and an inner join would
        # silently drop such documents from the output — surface them as
        # the sentinel 'unbucketed' instead so downstream consumers see
        # every input row exactly once.
        F.when(F.col("_t1").isNull(), "unbucketed")
        .when(F.col(score_col) >= F.col("_t2"), "head")
        .when(F.col(score_col) >= F.col("_t1"), "middle")
        .otherwise("tail")
    )
    return (
        scored.join(F.broadcast(thr), strata_col, "left")
        .withColumn("ppl_bucket", bucket)
        .drop("_t1", "_t2")
    )


def hashed_classifier_score(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
    bias: float = 0.0,
) -> DataFrame:
    """Frozen linear text classifier over hashed n-gram features — the
    fastText deployment shape (Joulin et al. 2017) used as the
    "quality classifier" stage of GPT-3/LLaMA-style pipelines (Brown
    et al. 2020 §A: a classifier trained on a curated-vs-crawl
    distinction scores every crawl document): the model ships as a
    ``(bucket, wt)`` weight table, inference is a broadcast join of the
    gram stream against it, score = mean feature weight (fastText's
    mean-of-embeddings with dim=1), prob = sigmoid(bias + score).

    ``weights`` is ANY ``(bucket, wt)`` table — the real deployment
    imports trained weights; tests and the registered query feed a
    deterministic pseudo-table. Buckets absent from the table weigh 0
    (an untrained hash bucket is exactly "no evidence"). ``prob`` is
    computed from the ROUNDED margin so both engines exponentiate
    identical inputs.

    Scale: the weight table is <= ``buckets`` rows — always broadcast;
    the only shuffle is the per-doc mean. Inference over 100 TB is one
    scan + map-side join + partial-aggregable average.
    """
    g = hashed_gram_buckets(df, text_col, id_col, buckets)
    margin = F.round(F.avg(F.coalesce(F.col("wt"), F.lit(0.0))), 6)
    return (
        g.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            margin.alias("margin"),
        )
        .withColumn(
            "prob",
            F.round(
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-(F.lit(float(bias)) + F.col("margin")))),
                6,
            ),
        )
    )


def classifier_feature_frame(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
) -> DataFrame:
    """The trainer's (doc, bucket, count, n_grams, label) feature table as
    an un-truncated DataFrame — :func:`hashed_classifier_train` checkpoints
    it once (every round re-reads it), and the plan audit builds it here
    WITHOUT the checkpoint so the iteration's real scan/shuffle shape is
    inspectable (checkpoint truncation otherwise hides it)."""
    g = hashed_gram_buckets(df, text_col, id_col, buckets)
    labels = df.select(
        F.col(id_col), F.col(label_col).cast("double").alias("_y")
    )
    counts = g.groupBy(id_col, "bucket").agg(F.count("*").alias("_c"))
    # n_grams per doc = Σ_bucket count — derived from counts (whose
    # exchange both consumers then share) instead of re-running the gram
    # extraction for a second aggregate (r15 optimization)
    nd = counts.groupBy(id_col).agg(F.sum("_c").alias("_n"))
    return (
        counts.join(nd, id_col)
        .join(labels, id_col)
        .select(id_col, "bucket", "_c", "_n", "_y")
    )


def classifier_gradient_frame(
    feats: DataFrame, weights: dict[int, float], id_col: str = "doc_id"
) -> DataFrame:
    """ONE gradient-descent round's per-bucket gradient as an un-collected
    (bucket, _g) DataFrame — the loop body :func:`hashed_classifier_train`
    executes each round (broadcast current weights → per-doc margin by one
    partial-aggregable sum → per-bucket residual·count/n sum in
    DECIMAL(28,12)). Extracted so the trainer and the plan audit share one
    source of truth: the trainer collects the ≤ ``buckets``-row result to
    the driver, the audit explains the frame itself."""
    spark = feats.sparkSession
    if weights:
        wdf = spark.createDataFrame(
            sorted(weights.items()), "bucket long, wt double"
        )
        joined = feats.join(F.broadcast(wdf), "bucket", "left")
    else:
        joined = feats.withColumn("wt", F.lit(None).cast("double"))
    dm = joined.groupBy(id_col, "_y", "_n").agg(
        F.sum(F.col("_c") * F.coalesce(F.col("wt"), F.lit(0.0))).alias("_s")
    )
    resid = dm.select(
        id_col,
        (
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-(F.col("_s") / F.col("_n"))))
            - F.col("_y")
        ).alias("_r"),
    )
    return (
        feats.join(resid, id_col)
        .select(
            "bucket",
            (F.col("_r") * F.col("_c") / F.col("_n")).alias("_gc"),
        )
        .groupBy("bucket")
        .agg(F.sum(F.col("_gc").cast("decimal(28,12)")).alias("_g"))
    )


def hashed_classifier_train(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
    lr: float = 1.0,
    rounds: int = 1,
) -> DataFrame:
    """TRAIN the hashed-gram quality classifier — the missing half of the
    fastText deployment next to :func:`hashed_classifier_score`'s
    inference (Joulin et al. 2017; the GPT-3 §A curated-vs-crawl recipe
    trains exactly this: a linear model over hashed text features where
    label 1 is the curated reference and 0 the raw crawl): distributed
    batch gradient descent on the log loss of
    ``p = sigmoid(mean feature weight)``.

    Per round: current weights broadcast onto the (doc, bucket, count)
    feature table, per-doc margin/probability by one partial-aggregable
    sum, per-bucket gradient ``Σ_docs (p_d − y_d)·c_db / n_d`` by a
    second, the ≤ ``buckets``-row gradient pulled to the driver and
    applied — driver state is the weight vector, the k-means/IVF bounded
    class, never corpus-sized. The feature table is localCheckpointed
    once (every round reads it; the gram explode never re-runs).

    Round-1 from zero weights is engine-exact and fully oracle-twinnable:
    ``p_d = 0.5`` identically, per-(doc, bucket) contributions are single
    IEEE expressions both engines evaluate bit-identically, and the
    per-bucket sum goes through DECIMAL(28,12) (associative — any
    partial-agg order gives the same bits; double→decimal is safe off
    binary-representable half-ties). Later rounds' margins are
    shuffle-order float sums — rows-only territory, pinned by the NumPy
    reference pytest. Returns ``(bucket, wt)`` with round-6 weights
    (+0.0 so a −0.0 never leaks into a value hash); feed it straight to
    :func:`hashed_classifier_score`.
    """
    spark = df.sparkSession
    feats = classifier_feature_frame(
        df, label_col, text_col, id_col, buckets
    ).localCheckpoint()
    # the batch-GD divisor counts EVERY labeled document, including ones
    # whose text tokenizes to zero grams (they contribute zero gradient —
    # no features — but they are still training examples in the stated
    # (1/m)·Σ_docs math)
    n_docs = df.select(id_col).distinct().count()
    if not n_docs:
        return spark.createDataFrame([], "bucket long, wt double")
    w: dict[int, float] = {}
    for _ in range(int(rounds)):
        grad = classifier_gradient_frame(feats, w, id_col).collect()
        for row in grad:
            b = int(row["bucket"])
            w[b] = w.get(b, 0.0) - lr * (float(row["_g"]) / n_docs)
    return spark.createDataFrame(
        [(b, round(v, 6) + 0.0) for b, v in sorted(w.items())],
        "bucket long, wt double",
    )

"""Deduplication operators (SURVEY §2.6 D1 + LLM-pipeline extensions).

Scale posture: every variant is a single shuffle on a derived key (hash,
band, bucket). Nothing collects to the driver; candidate generation always
goes through a key-equality join so Spark can hash-partition it.
"""

from __future__ import annotations

import itertools

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.layout import rebalance_for_compute

_OBSERVE_IDS = itertools.count()  # observation names must be plan-unique


def first_wins(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """D1 — keep the first row per key under an explicit arrival order.

    The reference's ``Set<String> rk`` skip (RdlETL.java:106,112-114) is
    order-sensitive on a nondeterministic stream; Spark needs the tiebreaker
    explicit (SURVEY §7.3) — pass e.g. ``[F.col("seq")]``.
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# LLM-pipeline dedup family (north-star extensions, SURVEY §7.2 M4)
# ---------------------------------------------------------------------------


def normalize_text(col: Column) -> Column:
    """Canonical form for content hashing: lowercase, collapse whitespace."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, fingerprint) winners of exact dedup: md5 of normalized content,
    lowest id per digest. ``groupBy.agg(min)`` instead of a row_number window
    so the shuffle gets map-side partial aggregation and carries only the
    (32-char digest, id) pair — never the document body."""
    keyed = df.select(
        F.col(id_col).alias(id_col),
        F.md5(normalize_text(F.col(text_col))).alias("fingerprint"),
    )
    return (
        keyed.groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, "fingerprint")
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact near-identical dedup, returning the surviving full rows.

    Two narrow shuffles — (digest, id) partial-agg, then a semi join back on
    the id — instead of one window shuffle that would carry every document
    body. At 100 TB the body-free shuffle is the difference between a
    digest-sized exchange and re-exchanging the corpus."""
    winners = exact_fingerprints(df, text_col, id_col).select(id_col)
    return df.join(winners, on=id_col, how="left_semi")


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles of normalized text (array<string>).

    Documents shorter than n words yield a single whole-text shingle so they
    still participate (and exact-duplicate short docs still collide).

    NOTE: when `col` is a raw text column, the split is re-evaluated inside
    the lambda per shingle (no CSE across HOF iterations) — O(words²) per
    doc. Hot paths should use :func:`shingle_rows`, which materializes the
    word array in its own projection first.
    """
    return _grams_from_words(F.split(normalize_text(col), " "), n)


def _grams_from_words(words: Column, n: int) -> Column:
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i + 1, n), " "),
    )
    return F.array_distinct(grams)


def shingle_rows(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """Exploded (id, shingle) rows, computed in two projections so the word
    array is an attribute by the time the n-gram lambda runs (Catalyst does
    not collapse the projects because the alias is referenced repeatedly by
    a non-cheap expression). Turns the per-doc cost from O(words²) string
    splitting into O(words)."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    # id-hash repartition before the explode: gram building is CPU-heavy
    # and must not inherit the scan's split count (a small corpus arrives
    # as one split = one task; measured 1.5x on ngram_jaccard at sf0.1).
    # The exchange carries (id, words) — no larger than the doc side, and
    # dwarfed by the gram shuffle every consumer does next.
    sc = df.sparkSession.sparkContext
    return (
        df.select(F.col(id_col).alias("_id"), words.alias("_w"))
        .repartition(sc.defaultParallelism, F.col("_id"))
        .select("_id", F.explode(_grams_from_words(F.col("_w"), n)).alias("_sh"))
    )


def _ordered_pairs(ids_arr: Column) -> Column:
    """All (id_a < id_b) pairs from a sorted id array, as struct rows.

    Per-bucket pair expansion replaces a bucket self-join: the upstream
    pipeline (shingle/minhash compute) runs ONCE instead of once per join
    side (broadcast self-joins defeat exchange reuse — the two sides carry
    different exchange types). Pair count is quadratic in bucket size by the
    algorithm's nature; cap pathological buckets upstream (a bucket shared
    by k docs is k(k-1)/2 candidates under either formulation).
    """
    return F.flatten(
        F.transform(
            ids_arr,
            lambda x, i: F.transform(
                F.slice(ids_arr, i + 2, F.size(ids_arr)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )


def _capped_bucket_ids(
    long_df: DataFrame,
    key: str,
    id_colname: str,
    max_bucket: int | None,
    metric_ns: str,
) -> DataFrame:
    """Per-bucket sorted id arrays with a COUNT-FIRST hot-bucket cap.

    Bucket sizes are pre-computed with a plain ``groupBy(key).count()``
    over the shared key exchange — a streaming aggregate whose state is
    one counter per bucket, so a pathological bucket (a boilerplate band
    key shared by 10^8 docs at 100 TB) reduces to one row regardless of
    its size. Over-cap keys are dropped by a key join BEFORE any
    ``collect_list``, so the hot bucket's id array is never materialized
    in an aggregation buffer (the prior shape filtered AFTER
    ``collect_list``: the cap prevented the B²/2 pair explosion but
    still built the full B-element array in one task — ~800 MB for a 10^8
    bucket, brushing Spark's 2 GB collection limit). The drop metrics
    (``{ns}_dropped_buckets`` / ``{ns}_dropped_rows``) ride the count
    stage via ``observe``. Both join and final aggregation key on ``key``,
    so the exchange introduced by the count pre-pass is reused for the
    collect stage (one shuffle of the long rows, same as before).

    ``max_bucket=None`` skips the pre-pass entirely (single aggregation).
    Bucket-size semantics are identical to ``size(collect_list(...))`` —
    the oracle SQL for the capped queries is unchanged.

    Skew note: the hot bucket's rows still cross the key exchange once and
    are dropped AT the join — one task streams (broadcast build) or
    spill-sorts (co-partitioned build) the hot partition's narrow
    (key, id) rows before discarding them. The alternative — broadcast
    the hot keys and anti-filter map-side so hot rows never shuffle —
    requires the count branch to re-derive the banded rows outside the
    shared exchange, re-running the signature pipeline (measured +25%;
    the md5/shingle CPU dominates a spillable narrow-row sort at any
    scale), so the shared-exchange shape wins.

    Both branches hang off ONE explicit repartition on the bucket key, and
    the count deliberately references ``id_colname`` (``count(id)``, ids
    are non-null by contract) so column pruning leaves both subtrees
    canonically identical — AQE's runtime exchange reuse then computes the
    upstream pipeline (scan → shingles → signatures → banding) once, not
    once per branch. The join and the final aggregation both key on
    ``key``, already satisfied by that partitioning.
    """
    if max_bucket is None:
        # Same null-key contract as the capped branch below (which drops
        # nulls via its inner join): one shared semantic whether or not a
        # cap is set. All production bucket keys are non-null; this guards
        # a future nullable key from silently diverging between modes.
        return (
            long_df.filter(F.col(key).isNotNull())
            .groupBy(key)
            .agg(F.sort_array(F.collect_list(id_colname)).alias("_ids"))
        )
    # Explicit null-key filter BEFORE the shared repartition: the inner join
    # drops null keys anyway (no semantic change), but without it Catalyst
    # infers isnotnull(key) only on the join branch, the two subtrees stop
    # being canonically equal, and AQE cannot reuse the exchange (observed
    # on the winnow path, whose window-min fp is nullable to the analyzer).
    banded = long_df.filter(F.col(key).isNotNull()).repartition(F.col(key))
    counts = banded.groupBy(key).agg(F.count(id_colname).alias("_n"))
    hot = F.col("_n") > max_bucket
    keep = (
        counts.observe(
            f"{metric_ns}_bucket_cap_{next(_OBSERVE_IDS)}",  # plan-unique
            F.sum(F.when(hot, 1).otherwise(0)).alias(
                f"{metric_ns}_dropped_buckets"
            ),
            F.sum(F.when(hot, F.col("_n")).otherwise(0)).alias(
                f"{metric_ns}_dropped_rows"
            ),
        )
        .filter(~hot)
        .select(key)
    )
    # INNER join on the under-cap keys, not an anti join on the hot keys:
    # with the anti form Catalyst hoists the shared repartition above the
    # join, the two branches stop being canonically equal, and the
    # signature pipeline computes twice (measured +25%). Broadcast vs
    # shuffled build is the planner's size-based choice — at corpus scale
    # the keep side exceeds the broadcast threshold and both sides are
    # already partitioned on ``key``, so the join is co-partitioned with
    # no extra exchange.
    return (
        banded.join(keep, key)
        .groupBy(key)
        .agg(F.sort_array(F.collect_list(id_colname)).alias("_ids"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_bucket: int | None = None,
) -> DataFrame:
    """N-gram Jaccard near-duplicate pairs: explode shingles → self-join on
    shingle → |intersection| per pair → |union| via per-doc counts.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    At scale the shingle join is the standard document-pair candidate
    generator; feed it through ``minhash_bucket_pairs`` first to cap the
    candidate set when corpora are huge.

    Per-doc shingle-set sizes come from the ARRAY LENGTH in a plain
    projection — not a second explode+groupBy over the corpus (shingles
    are distinct per doc, so |set| == array size); that removes a full
    shuffle and a second evaluation of the shingle pipeline.

    ``max_bucket`` applies the count-first hot-bucket cap
    (:func:`_capped_bucket_ids`) to the shingle buckets — the same 2
    GB-array / quadratic-expansion guard as the LSH and winnowing
    matchers, for the shingle shared by a corpus-wide boilerplate run.
    Dropped shingles leave the intersection count but NOT the per-doc set
    sizes, so capped-mode jaccard is an UNDERESTIMATE for pairs sharing
    hot shingles — the conservative direction for a dedup gate (standard
    document-frequency shingle pruning, CCNet-style); drops surface as
    ``jaccard_dropped_buckets`` / ``jaccard_dropped_rows`` observe
    metrics.
    """
    # shuffle 8-byte shingle hashes, not the shingle strings themselves —
    # the intersection only needs equality, and xxhash64 collisions are
    # negligible against corpus-scale shingle counts (~N²/2⁶⁵)
    sh = shingle_rows(df, text_col, id_col, n).select(
        "_id", F.xxhash64("_sh").alias("_sh")
    )
    words = F.split(normalize_text(F.col(text_col)), " ")
    sizes = df.select(
        F.col(id_col).alias("_id"), words.alias("_w")
    ).select("_id", F.size(_grams_from_words(F.col("_w"), n)).alias("_sz"))
    inter = (
        _capped_bucket_ids(sh, "_sh", "_id", max_bucket, "jaccard")
        .select(F.explode(_ordered_pairs(F.col("_ids"))).alias("_p"))
        .groupBy(F.col("_p.id_a").alias("id_a"), F.col("_p.id_b").alias("id_b"))
        .agg(F.count("*").alias("_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("_sz", "_sza"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("_sz", "_szb"), "id_b")
        .withColumn(
            "jaccard",
            F.col("_inter") / (F.col("_sza") + F.col("_szb") - F.col("_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents that share word
    n-grams with a held-out benchmark/eval set (the GPT-3-style train-test
    overlap filter).

    Returns ``(id, n_hits, contaminated)`` for every corpus row, where
    ``n_hits`` counts the document's *distinct* n-grams that occur anywhere
    in the benchmark. Scale posture: the benchmark side is tiny relative to
    the corpus, so its distinct-gram set is broadcast — the corpus is
    streamed through a broadcast semi join with no corpus-wide shuffle; the
    only exchange is the per-doc hit count on (id) pairs.
    """
    bench_grams = (
        shingle_rows(benchmark, text_col, id_col, n).select("_sh").distinct()
    )
    hits = (
        shingle_rows(corpus, text_col, id_col, n)
        .join(F.broadcast(bench_grams), "_sh", "left_semi")
        .groupBy("_id")
        .agg(F.count("*").alias("n_hits"))
        .withColumnRenamed("_id", id_col)
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )


def decontaminate_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_hits: int = 1,
    expected_items: int = 1_000_000,
    num_bits: int = 8_388_608,
) -> DataFrame:
    """Two-phase decontamination — the shape a 100 TB corpus actually
    runs when even the benchmark's DISTINCT-gram set is too large to
    broadcast as strings: phase 1 broadcasts a Bloom bitmap of the
    benchmark grams (``num_bits`` bits ≈ 1 MiB per 2^23, vs tens of
    bytes per gram string — a 100M-gram eval suite fits in ~120 MiB as
    bits) and drops the overwhelming majority of corpus grams map-side;
    phase 2 exactly confirms the surviving candidates with a string
    semi-join that only sees ~hits + fpp·volume candidate rows — and is
    NOT forced to broadcast, so an over-broadcast-sized gram set
    shuffles instead of OOMing the driver. A Bloom
    bitmap has NO false negatives, so the output is bit-identical to
    :func:`decontaminate` — the probabilistic structure is a pushed
    prefilter, not an approximation, and the query stays fully
    oracle-twinnable (the oracle replays the exact semantics).

    The bitmap is built from PUBLIC primitives (Spark's
    ``bloom_filter_agg`` is an internal-registry function): bucket =
    ``xxhash64(gram) mod num_bits``, packed into 64-bit words by a
    partial-aggregable ``bit_or`` — ≤ ``num_bits``/64 ``(word, bits)``
    long rows, the k=1 Bloom construction. The probe is a broadcast
    hash join on the word index plus one AND — scan-fused, map-side.
    ``expected_items`` documents the sizing contract (choose
    ``num_bits`` ≳ 20× the expected distinct grams for ~5% fpp at k=1);
    the only corpus-sized exchange left is the per-doc hit count, same
    as the exact operator.
    """
    bench_grams = (
        shingle_rows(benchmark, text_col, id_col, n).select("_sh").distinct()
    )
    if num_bits < 20 * expected_items:
        raise ValueError(
            f"num_bits={num_bits} under-sized for expected_items="
            f"{expected_items}: k=1 Bloom wants >= 20 bits/item"
        )

    # bucket = xxhash64(gram) mod num_bits; word index = bucket >> 6,
    # in-word mask = 1L << (bucket & 63). PySpark's shiftleft() only takes
    # a literal shift amount, so the mask goes through expr().
    _bucket_sql = f"pmod(xxhash64(_sh), cast({num_bits} as bigint))"
    _word = F.expr(f"shiftright({_bucket_sql}, 6)")
    _mask = F.expr(
        f"shiftleft(cast(1 as bigint), cast({_bucket_sql} & 63 as int))"
    )

    bits = (
        bench_grams.select(_word.alias("_w"), _mask.alias("_m"))
        .groupBy("_w")
        .agg(F.bit_or("_m").alias("_bits"))
    )
    probe = shingle_rows(corpus, text_col, id_col, n).select(
        "_id", "_sh", _word.alias("_pw"), _mask.alias("_pm")
    )
    cand = (
        probe.join(F.broadcast(bits), probe["_pw"] == bits["_w"])
        .filter(F.col("_bits").bitwiseAND(F.col("_pm")) != 0)
        .select("_id", "_sh")
    )
    # no forced broadcast: the premise of this operator is that the
    # benchmark's STRING set may be too large to broadcast — the confirm
    # join keys on _sh over the (already tiny) candidate stream, and
    # Catalyst/AQE picks broadcast only when the gram set actually fits
    hits = (
        cand.join(bench_grams, "_sh", "left_semi")
        .groupBy("_id")
        .agg(F.count("*").alias("n_hits"))
        .withColumnRenamed("_id", id_col)
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signatures, deterministic and oracle-friendly.

    Hash family: one md5 digest per *seed group* — ``md5(shingle || '#g')``
    — sliced into four 8-hex-char (32-bit) chunks, each chunk an independent
    hash function; the per-function minimum over a document's shingles is
    the signature element. Amortizing 4 hash functions per digest quarters
    the dominant cost (md5 over every shingle) versus one digest per seed,
    and fixed-width lowercase-hex min is still engine-portable — the DuckDB
    oracle replays ``min(substr(md5(s || '#g'), off, 8))`` exactly. Catalyst
    CSE evaluates each group digest once per row across its four aggregates.
    All JVM-side: explode → groupBy(id) → min per function, one shuffle.
    """
    sh = shingle_rows(df, text_col, id_col, shingle_n)
    aggs = []
    for i in range(num_hashes):
        g, j = divmod(i, 4)
        digest = F.md5(F.concat(F.col("_sh"), F.lit(f"#{g}")))
        aggs.append(
            F.min(F.substring(digest, 1 + 8 * j, 8)).alias(f"mh_{i}")
        )
    return sh.groupBy("_id").agg(*aggs).withColumnRenamed("_id", id_col)


def minhash_bands(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Long band-key frame ``(_id, _bk)``: the document's LSH index rows.
    Band key = md5 over (band index | that band's signature slice), so a
    key only collides within the same band. This frame IS the persistable
    dedup index — at scale, write it bucketed by ``_bk`` at ingest and
    incremental batches join against it (``minhash_incremental_pairs``)
    instead of re-banding the corpus."""
    rows_per_band = num_hashes // bands
    sig = minhash_signature(df, text_col, id_col, num_hashes, shingle_n)
    band_cols = [
        F.md5(
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)],
            )
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select(F.col(id_col).alias("_id"), *band_cols)
    return banded.select(
        "_id",
        F.explode(F.array(*[F.col(f"band_{b}") for b in range(bands)])).alias("_bk"),
    )


def minhash_incremental_pairs(
    history: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Incremental near-dup candidates: NEW batch against the HISTORICAL
    corpus — the arriving-data shape of LSH dedup. Cost is O(new): only
    the new batch is shingled/banded fresh; the history side is its band
    index (`minhash_bands`), which a production pipeline PERSISTS at
    ingest (bucketed by band key) so this join is index-lookup-shaped,
    never a corpus re-scan. Returns distinct ``(new_id, hist_id)``
    collisions; in-batch pairs come from ``minhash_bucket_pairs(new)``,
    keeping the two concerns (intra-batch vs against-history) separately
    cappable. The exact-dedup twin of this pattern is
    ``dedup_incremental`` (anti join on digests).
    """
    h = minhash_bands(history, text_col, id_col, num_hashes, bands, shingle_n)
    n = minhash_bands(new, text_col, id_col, num_hashes, bands, shingle_n)
    return (
        n.select(F.col("_id").alias("new_id"), "_bk")
        .join(h.select(F.col("_id").alias("hist_id"), "_bk"), "_bk")
        .select("new_id", "hist_id")
        .distinct()
    )


def minhash_bucket_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash + LSH banding: signature → band keys → per-bucket pair
    expansion.

    Returns distinct candidate pairs (id_a < id_b) that collide in at least
    one band. Probability of collision rises sharply with Jaccard similarity
    (standard banding argument, Mining of Massive Datasets ch.3). The
    bucket stage shuffles only (band_key, id) pairs — constant-size rows —
    and pairs are expanded inside each bucket's collected id array, so the
    signature pipeline runs once (a bucket self-join would compute it per
    join side; see :func:`_ordered_pairs`).

    ``max_bucket`` caps pathological buckets: pair expansion is quadratic
    in bucket size, so one degenerate band key (e.g. a boilerplate corpus
    where thousands of documents share a signature band) would otherwise
    produce a single task materializing millions of pairs. Buckets larger
    than the cap are dropped entirely (their members are near-certain
    duplicates of each other caught by OTHER bands, or boilerplate best
    handled by exact dedup). The cap is COUNT-FIRST
    (:func:`_capped_bucket_ids`): bucket sizes come from a skew-immune
    partial-aggregating count, over-cap keys are semi-joined away, and
    only surviving buckets collect their id arrays — a hot bucket never
    materializes its member list. The drop is surfaced as ``observe``
    metrics (``lsh_dropped_buckets`` / ``lsh_dropped_rows``) so pipelines
    can alert on silent candidate loss. Deterministic — the cap is a pure
    size predicate, mirrored exactly by the SQL oracle.
    """
    long_bands = minhash_bands(
        df, text_col, id_col, num_hashes, bands, shingle_n
    )
    buckets = _capped_bucket_ids(long_bands, "_bk", "_id", max_bucket, "lsh")
    return (
        buckets.select(F.explode(_ordered_pairs(F.col("_ids"))).alias("_p"))
        .select(F.col("_p.id_a").alias("id_a"), F.col("_p.id_b").alias("id_b"))
        .distinct()
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
) -> DataFrame:
    """SimHash fingerprint over word features (Charikar 2002).

    Each word hashes to `bits` bits (xxhash64 with per-bit derived masks);
    the fingerprint's bit i is 1 iff the majority of words set bit i.
    Near-duplicates differ in few bits (compare with ``bit_count(a ^ b)``).
    Entirely JVM expression tree: explode words → per-bit set-counts →
    reassemble. One shuffle.

    The per-bit counts are SIMD-packed: two 32-bit counter lanes ride in
    each 64-bit sum (the lo lane would carry into the hi lane only for a
    single document exceeding 2^32 words — ~16 TB of text in ONE row, far
    beyond any realistic document; the bound is a per-document property,
    so it holds at any corpus scale), so the aggregation runs ``bits/2``
    sums instead of ``bits`` — measured ~20% faster end-to-end at sf0.1
    with bit-identical output.
    """
    if bits % 2 != 0:
        raise ValueError(f"bits must be even (lane packing), got {bits}")
    half = bits // 2
    # rebalance BEFORE the explode (r15): the per-word hash + packed-lane
    # partial aggregation otherwise runs inside the scan stage — one task
    # on a single-split input; no-op when the scan is already well-split
    words = rebalance_for_compute(
        df.select(
            F.col(id_col).alias("_id"),
            F.split(normalize_text(F.col(text_col)), " ").alias("_wa"),
        ),
        "_id",
    ).select("_id", F.explode("_wa").alias("_w")).withColumn(
        "_h", F.xxhash64("_w")
    )
    one = F.lit(1).cast("long")
    aggs = [F.count("*").alias("_n")]
    for i in range(half):
        lo = F.shiftrightunsigned("_h", i).bitwiseAND(one)
        hi = F.shiftrightunsigned("_h", i + half).bitwiseAND(one)
        aggs.append(F.sum(lo + F.shiftleft(hi, 32)).alias(f"_c{i}"))
    sums = words.groupBy("_id").agg(*aggs)
    # majority vote per lane: bit set iff 2*count_set > n_words (the
    # sign-sum formulation 2c - n > 0, with c recovered from its lane)
    fp = F.lit(0).cast("long")
    lane_mask = F.lit((1 << 32) - 1).cast("long")
    for i in range(half):
        lo_c = F.col(f"_c{i}").bitwiseAND(lane_mask)
        hi_c = F.shiftrightunsigned(f"_c{i}", 32)
        fp = fp.bitwiseOR(
            F.when(lo_c * 2 > F.col("_n"), F.shiftleft(one, i)).otherwise(
                F.lit(0).cast("long")
            )
        )
        fp = fp.bitwiseOR(
            F.when(hi_c * 2 > F.col("_n"), F.shiftleft(one, i + half)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sums.select(F.col("_id").alias(id_col), fp.alias("simhash"))


def simhash_md5(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """SimHash fingerprint with cross-engine-deterministic bits (md5 family,
    like :func:`minhash_signature`): each word's ``bits`` feature bits are
    the low bits of ``conv(substr(md5(word), 1, 8), 16, 10)`` — one hex
    parse per word (DuckDB twin: ``('0x' || substr(md5(s),1,8))::BIGINT``),
    not one string op per bit. ``bits`` <= 32 (8 hex chars).

    Same algorithm as :func:`simhash` (Charikar 2002) but reproducible in
    any engine with ``md5`` + hex-to-int — used where a DuckDB oracle must
    replay the fingerprints; the xxhash64 variant stays the production
    default. Per-bit counts are lane-packed 4-per-sum (16-bit lanes →
    ``bits/4`` aggregation buffers instead of ``bits``); a 16-bit lane
    caps a SINGLE document at 65535 words (~0.4 MB of text) — beyond
    that, use :func:`simhash`, whose 32-bit lanes are unbounded for any
    realistic document.
    """
    if not 0 < bits <= 32:
        raise ValueError(f"bits must be in 1..32, got {bits}")
    if bits % 4 != 0:
        raise ValueError(f"bits must be a multiple of 4 (lane packing), got {bits}")
    words = rebalance_for_compute(
        df.select(
            F.col(id_col).alias("_id"),
            F.split(normalize_text(F.col(text_col)), " ").alias("_wa"),
        ),
        "_id",
    ).select("_id", F.explode("_wa").alias("_w")).withColumn(
        "_h", F.conv(F.substring(F.md5("_w"), 1, 8), 16, 10).cast("long")
    )
    one = F.lit(1).cast("long")
    aggs = [F.count("*").alias("_n")]
    for j in range(bits // 4):
        packed = F.lit(0).cast("long")
        for lane in range(4):
            bit = F.shiftrightunsigned("_h", 4 * j + lane).bitwiseAND(one)
            packed = packed + F.shiftleft(bit, 16 * lane)
        aggs.append(F.sum(packed).alias(f"_p{j}"))
    sums = words.groupBy("_id").agg(*aggs)
    lane_mask = F.lit((1 << 16) - 1).cast("long")
    fp = F.lit(0).cast("long")
    for i in range(bits):
        cnt = F.shiftrightunsigned(f"_p{i // 4}", 16 * (i % 4)).bitwiseAND(
            lane_mask
        )
        fp = fp.bitwiseOR(
            F.when(cnt * 2 > F.col("_n"), F.shiftleft(one, i))
            .otherwise(F.lit(0).cast("long"))
        )
    return sums.select(F.col("_id").alias(id_col), fp.alias("simhash"))


def simhash_hamming_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "simhash",
    max_hamming: int = 3,
    bands: int = 4,
    bits: int = 32,
) -> DataFrame:
    """All pairs of fingerprints within Hamming distance ``max_hamming`` —
    bucketed by exact-match banding, never all-pairs.

    The fingerprint is cut into ``bands`` equal-width lanes; by pigeonhole,
    two fingerprints differing in <= ``max_hamming`` bits agree exactly on
    at least one lane whenever ``bands > max_hamming`` — so a key-equality
    self-join on ``(band_index, lane_value)`` generates a candidate set
    with guaranteed recall, and ``bit_count(a ^ b) <= k`` verifies. This is
    the Hamming-space analogue of MinHash-LSH banding (MMDS ch.3 §3.9.3 /
    Manku et al. WWW'07's simhash dedup): candidate volume scales with
    bucket occupancy, not N².

    Scale shape: one explode (``bands`` rows per doc), one hash-partitioned
    equi-join on the 2-tuple key, verification is a bitwise expression.
    Returns ``(id_a, id_b, hamming)`` with ``id_a < id_b``, one row per
    pair.
    """
    if bands <= max_hamming:
        raise ValueError(
            f"need bands > max_hamming for guaranteed recall "
            f"(pigeonhole), got bands={bands} max_hamming={max_hamming}"
        )
    if bits % bands != 0:
        raise ValueError(f"bits={bits} not divisible by bands={bands}")
    lane_bits = bits // bands
    mask = F.lit((1 << lane_bits) - 1).cast("long")
    lanes = fps.select(
        F.col(id_col).alias("_id"),
        F.col(fp_col).alias("_fp"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col(fp_col), b * lane_bits)
                        .bitwiseAND(mask)
                        .alias("lane"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_l"),
    ).select("_id", "_fp", F.col("_l.band").alias("_band"), F.col("_l.lane").alias("_lane"))
    a, b = lanes.alias("a"), lanes.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a._band") == F.col("b._band"),
                F.col("a._lane") == F.col("b._lane"),
                F.col("a._id") < F.col("b._id"),
            ],
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._fp").alias("_fa"),
            F.col("b._fp").alias("_fb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("_fa").bitwiseXOR(F.col("_fb")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_count: int = 10,
    sep: str = "\n",
) -> DataFrame:
    """Corpus-level boilerplate line removal (the CCNet/RefinedWeb line-dedup
    pass): any line occurring more than ``max_count`` times ACROSS the corpus
    (nav bars, license footers, cookie banners) is dropped from every
    document; whitespace-only lines are document structure and always kept.

    Returns ``(id_col, clean_text, n_kept, n_dropped)`` with the surviving
    lines rejoined in original order.

    Scale shape: the frequency aggregation shuffles 8-byte line hashes, not
    line text; the hot set (count > max_count) is tiny by construction —
    it's the corpus-wide boilerplate — and broadcasts to mark lines without
    shuffling the corpus; the rebuild is the one unavoidable corpus-wide
    shuffle, keyed by document id. Not in the reference (its D1 dedup is
    row-level); this is the LLM-pipeline extension of the same idea.

    ``sep`` is a literal separator (regex-escaped before the split — a '.'
    or '|' separator splits on the character, not the regex). Hot-line
    detection groups by ``xxhash64(line)``: a 64-bit collision between an
    innocent line and corpus boilerplate would drop the innocent line; at
    ~2^-64 per pair this is accepted (same trade every hash-keyed dedup in
    this module makes).
    """
    import re as _re

    lines = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), _re.escape(sep), -1)
        ).alias("pos", "line"),
    ).withColumn("_h", F.xxhash64("line"))
    hot = (
        lines.filter(F.trim("line") != "")
        .groupBy("_h")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") > max_count)
        .select("_h", F.lit(True).alias("_hot"))
    )
    marked = lines.join(F.broadcast(hot), on="_h", how="left").withColumn(
        "_drop", F.coalesce(F.col("_hot"), F.lit(False))
    )
    keep = F.when(~F.col("_drop"), F.struct("pos", "line"))
    return marked.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(keep)), lambda x: x["line"]
            ),
        ).alias("clean_text"),
        F.count(F.when(~F.col("_drop"), 1)).alias("n_kept"),
        F.count(F.when(F.col("_drop"), 1)).alias("n_dropped"),
    )


def positional_gram_rows(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """Exploded ``(_id, pos, gram)`` rows: EVERY k-word window with its
    0-based start position (no distinct — positions matter here, unlike
    :func:`shingle_rows`). Word array materialized in its own projection
    first so the per-position slice is O(words), not O(words²).
    Docs shorter than ``k`` words yield no rows.
    """
    words = F.split(normalize_text(F.col(text_col)), " ")
    # Shape: explode only the POSITION INTS, then build each gram from the
    # carried word array in a post-explode projection. The generator emits
    # ints; the array_join(slice(...)) per gram runs inside the SAME
    # whole-stage-codegen span as the filter above it, and the word array
    # never materializes per output row (the projection drops _w in the
    # same stage). The two rejected shapes, both measured at sf0.1:
    # building the gram ARRAY in its own projection and posexploding it
    # (the pre-r8 form) pays generator array materialization + per-row
    # copies — 3.4 s vs 0.3 s for this form; putting the transform/slice
    # tree inside the explode operator itself costs ~15 s of codegen
    # compilation.
    # The greatest-clamp (not just the size filter) keeps the sequence
    # expression itself short-doc-safe: Catalyst may reorder the filter
    # conjuncts it infers from the generator ahead of the size filter,
    # and an unclamped sequence(0, size-k) DESCENDS for size < k. For a
    # sub-k doc the clamp emits pos 0 with a short gram — and the size
    # filter drops the row anyway. The id-hash repartition decouples the
    # CPU-heavy gram build from the input split count (a small corpus
    # arrives as one split = one task) and pre-satisfies the per-doc
    # window partitioning downstream consumers need; at cluster scale the
    # input already has enough splits and the exchange is one narrow pass
    # over (id, words).
    sc = df.sparkSession.sparkContext
    return (
        df.select(F.col(id_col).alias("_id"), words.alias("_w"))
        .filter(F.size("_w") >= k)
        .repartition(sc.defaultParallelism, F.col("_id"))
        .select(
            "_id",
            F.size("_w").alias("_nw"),
            "_w",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.size("_w") - k, F.lit(0))
                )
            ).alias("pos"),
        )
        .select(
            "_id",
            "_nw",
            "pos",
            F.array_join(
                F.slice("_w", F.col("pos") + 1, F.lit(k)), " "
            ).alias("gram"),
        )
    )


def duplicate_spans(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8
) -> DataFrame:
    """Exact substring-duplication report per document (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better" — the
    suffix-array ExactSubstr dedup, re-expressed for Spark at k-word
    granularity; reference repo has no analog, this is LLM-pipeline layer).

    A k-gram is *duplicated* when it occurs >= 2 times corpus-wide
    (across docs or repeated within one). Per doc, overlapping/adjacent
    duplicated gram starts merge into maximal spans (gaps-and-islands on
    start positions: two starts p1 < p2 produce overlapping-or-adjacent
    k-word spans iff p2 - p1 <= k, so a gap > k starts a new island —
    NOT gap > 1, which would double-count the overlap of starts spaced
    2..k-1 apart and let dup_frac exceed 1.0). Reports, per doc with any
    duplication: span count, duplicated word mass (span word-lengths,
    overlaps merged — islands are disjoint by the gap rule, so
    dup_words <= total_words always), and the duplicated fraction — the
    quantity you threshold to drop or trim boilerplate-heavy documents
    before training.

    Scale posture: the corpus-wide frequency pass shuffles 8-byte
    xxhash64 gram keys (never gram strings) ONCE — duplicate tagging is
    a count window over the gram-hash partition, not a groupBy + join
    back (which would scan and explode the corpus twice; measured 2x on
    the bench). The island merge is one window per doc over only the
    DUPLICATED positions (a small fraction of the corpus). No all-pairs
    stage exists at any point — cost is O(total words) + O(duplicated
    positions · log per-doc run length). Candidate equality is on the
    64-bit hash; a collision needs ~2^32 grams (birthday) and then only
    inflates a span by k words. A pathological gram (corpus-wide
    boilerplate) makes one window group huge — WindowExec spills it,
    and the group carries 20 bytes/row, not document bodies.
    """
    grams = positional_gram_rows(df, text_col, id_col, k).select(
        "_id", "_nw", "pos", F.xxhash64("gram").alias("_gh")
    )
    pos = (
        grams.withColumn(
            "_c", F.count("*").over(Window.partitionBy("_gh"))
        )
        .filter(F.col("_c") >= 2)
        .select("_id", "_nw", "pos")
    )
    w = Window.partitionBy("_id").orderBy("pos")
    isl = pos.withColumn(
        "_grp",
        F.sum(
            F.when(
                F.col("pos") - F.lag("pos").over(w) > k, F.lit(1)
            ).otherwise(F.lit(0))
        ).over(w),
    )
    spans = isl.groupBy("_id", "_grp").agg(
        F.min("pos").alias("_s"),
        (F.max("pos") + F.lit(k - 1)).alias("_e"),
        F.first("_nw").alias("_nw"),
    )
    return (
        spans.groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.col("_e") - F.col("_s") + 1).alias("dup_words"),
            F.first("_nw").alias("total_words"),
        )
        .withColumn(
            "dup_frac",
            F.round(F.col("dup_words") / F.col("total_words"), 6),
        )
    )


# Winnowing tiebreak counter base: 10^12 keeps (base - pos) positive and
# 13-digit-padded. In practice the effective per-doc ceiling is far lower:
# `pos` comes from posexplode (32-bit IntegerType) and Spark arrays cap
# near 2^31 elements, so a document can never reach even ~2.1e9 grams —
# the base is belt-and-braces headroom over that structural limit, and
# the raise_error guard below is defense-in-depth, not a live code path.
_WINNOW_POS_MAX = 1_000_000_000_000


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 5,
    rows: bool = False,
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS local document fingerprinting algorithm).

    Every window of ``w`` consecutive k-gram hashes contributes its
    minimum hash (rightmost occurrence on ties); the distinct selected
    (hash, position) pairs are the document's fingerprint set. Guarantees
    any shared run of w+k-1 words between two documents shares >= 1
    fingerprint, while storing ~2/(w+1) of the grams.

    Hash = md5 hex of the gram so an external oracle (DuckDB) replays the
    selection bit-for-bit; rightmost-min tiebreak is encoded in ONE
    sortable string key ``md5 || (10^12 - pos)`` — min over a
    rows-following window frame, no struct ordering needed. The 10^12
    counter stays positive (and its 13-digit zero-pad order-correct) for
    any reachable position — posexplode yields 32-bit positions and Spark
    arrays cap near 2^31 elements, so the effective per-doc limit is
    INT_MAX grams, far below the counter base; the hard raise_error
    filter is defense-in-depth should that structural limit ever move.
    Per-doc output: gram count, fingerprint count, density (≈ 2/(w+1)).

    Scale posture: one window function per doc partition (no shuffle
    beyond the doc-id hash partitioning), selection is a frame min —
    O(words · w) comparisons JVM-side; the fingerprint set is the ~2/(w+1)
    sample you'd then feed to a bucket join for cross-doc matching.
    """
    grams = positional_gram_rows(df, text_col, id_col, k)
    # positions beyond the counter width would encode as '-'-prefixed
    # strings that sort BELOW every valid key and corrupt the min —
    # fail loudly instead (structurally unreachable: posexplode positions
    # are 32-bit ints, so it costs nothing in the happy path)
    pos_ok = F.when(
        F.col("pos") < _WINNOW_POS_MAX, F.col("pos")
    ).otherwise(
        F.raise_error(
            F.lit("winnow_fingerprints: document exceeds 10^12 grams")
        ).cast("int")
    )
    key = F.concat(
        F.md5("gram"),
        F.lpad((F.lit(_WINNOW_POS_MAX) - pos_ok).cast("string"), 13, "0"),
    )
    win = (
        Window.partitionBy("_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    sel = (
        grams.withColumn("_key", key)
        .withColumn("_sel", F.min("_key").over(win))
        # only full windows: starts 0 .. n_grams - w  (n_grams = _nw - k + 1)
        .filter(F.col("pos") <= F.col("_nw") - k + 1 - w)
        .select("_id", "_nw", "_sel")
    )
    if rows:
        # the raw fingerprint set: (id, selected hash) — the input you
        # feed a bucket join for cross-doc match candidates (MOSS's
        # index). ONE distinct, directly on the 32-char hash: a prior
        # distinct on the position-suffixed 45-char key would shuffle the
        # same rows a second time only to be collapsed again here
        # (distinct∘substring∘distinct ≡ distinct∘substring).
        return sel.select(
            F.col("_id").alias(id_col),
            F.substring("_sel", 1, 32).alias("fp"),
        ).distinct()
    # the per-doc fingerprint COUNT needs (hash, position) granularity —
    # _sel's position suffix is load-bearing here, so distinct the full key
    sel = sel.distinct()
    return (
        sel.groupBy(F.col("_id").alias(id_col))
        .agg(
            (F.first("_nw") - F.lit(k - 1)).alias("n_grams"),
            F.count("*").alias("n_fps"),
        )
        .withColumn(
            "density", F.round(F.col("n_fps") / F.col("n_grams"), 6)
        )
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_bucket: int | None = None,
) -> DataFrame:
    """N-gram CONTAINMENT near-duplicate pairs (Broder 1997's containment
    coefficient): ``C = |A∩B| / min(|A|,|B|)`` — the asymmetric companion
    to :func:`ngram_jaccard_pairs`. A short document quoted inside a long
    one scores near 1.0 here while its Jaccard stays near |A|/|B| ≈ 0 —
    the subset/quote relation every containment-blind dedup misses.

    Same scale shape as the Jaccard path: 8-byte hashed-shingle shuffle
    for the intersection, per-doc set sizes from array length in a plain
    projection (no second corpus pass), candidate pairs only through the
    shingle-equality join — never all-pairs. ``max_bucket`` applies the
    count-first hot-shingle cap exactly as in
    :func:`ngram_jaccard_pairs` (containment underestimates for pairs
    sharing dropped boilerplate shingles; drops surface as
    ``containment_dropped_*`` observe metrics).

    Returns (id_a, id_b, containment) with id_a < id_b and
    containment >= threshold.
    """
    sh = shingle_rows(df, text_col, id_col, n).select(
        "_id", F.xxhash64("_sh").alias("_sh")
    )
    words = F.split(normalize_text(F.col(text_col)), " ")
    sizes = df.select(
        F.col(id_col).alias("_id"), words.alias("_w")
    ).select("_id", F.size(_grams_from_words(F.col("_w"), n)).alias("_sz"))
    inter = (
        _capped_bucket_ids(sh, "_sh", "_id", max_bucket, "containment")
        .select(F.explode(_ordered_pairs(F.col("_ids"))).alias("_p"))
        .groupBy(F.col("_p.id_a").alias("id_a"), F.col("_p.id_b").alias("id_b"))
        .agg(F.count("*").alias("_inter"))
    )
    return (
        inter.join(
            sizes.withColumnRenamed("_id", "id_a")
            .withColumnRenamed("_sz", "_sza"),
            "id_a",
        )
        .join(
            sizes.withColumnRenamed("_id", "id_b")
            .withColumnRenamed("_sz", "_szb"),
            "id_b",
        )
        .withColumn(
            "containment",
            F.col("_inter") / F.least(F.col("_sza"), F.col("_szb")),
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


def winnow_match_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """Cross-document match candidates from shared winnowing fingerprints
    (the MOSS matcher, Schleimer et al. SIGMOD 2003 §4): two documents
    sharing >= ``min_shared`` selected fingerprints are reported with the
    shared count. Winnowing's guarantee makes this a RECALL statement:
    any shared run of w+k-1 words yields >= 1 shared fingerprint, so
    sufficiently long overlaps cannot hide.

    Scale shape: identical to the MinHash-LSH bucket join — fingerprints
    are the bucket keys, pairs expand inside each bucket's sorted id
    array (:func:`_ordered_pairs`), and the shuffle carries (32-char fp,
    id) rows from the ~2/(w+1) winnowed sample, not the corpus. A
    boilerplate fingerprint shared by B docs expands B(B-1)/2 pairs in
    one task — ``max_bucket`` caps that exactly like
    :func:`minhash_bucket_pairs`: buckets above the cap are dropped
    whole (boilerplate grams — license headers, navigation chrome — are
    match NOISE for a plagiarism matcher, and true duplicates still
    collide via their non-boilerplate fingerprints). COUNT-FIRST via
    :func:`_capped_bucket_ids` — the hot bucket's id array is never
    built; its size comes from a partial-aggregating count and its rows
    are semi-joined away before ``collect_list``. The drop is surfaced
    as ``observe`` metrics (``winnow_dropped_buckets`` /
    ``winnow_dropped_rows``) so pipelines alert on silent candidate
    loss. Deterministic pure size predicate, mirrored by the SQL oracle.
    """
    fps = winnow_fingerprints(df, text_col, id_col, k=k, w=w, rows=True)
    buckets = _capped_bucket_ids(fps, "fp", id_col, max_bucket, "winnow")
    return (
        buckets.select(F.explode(_ordered_pairs(F.col("_ids"))).alias("_p"))
        .groupBy(
            F.col("_p.id_a").alias("id_a"), F.col("_p.id_b").alias("id_b")
        )
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )

"""Deterministic, engine-portable sampling and dataset splitting.

Training-data pipelines need splits that are (a) stable across reruns and
engines — a document must land in the same split whether the pipeline ran
on Spark, DuckDB, or anything else that can compute md5 — and (b) driven by
row *identity*, not row *position*, so repartitioning or re-ingesting never
reassigns a row. ``rand()``/``df.sample`` give neither.

The primitive is the first 4 hex chars of ``md5(cast(id as string))``: a
uniform value in [0, 65536) compared lexicographically against hex
thresholds. Pure projection — no shuffle, no state, trivially pushable into
any scan, and identical in every engine with md5 (the DuckDB oracles
reproduce it verbatim).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 1 << 16  # 4 hex chars


def hash_hex(col: Column) -> Column:
    """4-hex-char uniform hash of a value's string form."""
    return F.substring(F.md5(col.cast("string")), 1, 4)


def threshold(fraction: float) -> str:
    """Hex threshold h such that P[hash_hex < h] == round(fraction * 2^16) / 2^16.

    fraction >= 1 returns "g", which is lexicographically above every hex
    string (hex digits end at "f") — a keep-everything sentinel. The naive
    5-char "10000" would compare *below* most 4-char hashes.
    """
    n = int(fraction * _BUCKETS)
    return "g" if n >= _BUCKETS else format(n, "04x")


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float
) -> DataFrame:
    """Identity-stable ~fraction sample: keeps rows whose hash falls below
    the threshold. Resolution is 1/65536 ≈ 0.0015%."""
    return df.filter(hash_hex(F.col(id_col)) < threshold(fraction))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the source-mixture primitive:
    keep ~``rates[stratum]`` of each stratum's rows (``default`` for strata
    not listed). The hash is salted with the stratum value so the kept sets
    of different strata are statistically independent even where ids
    overlap. Pure projection+filter: no shuffle, pushable into the scan."""
    return df.filter(stratified_keep_expr(id_col, strata_col, rates, default))


def stratified_keep_expr(
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default: float = 0.0,
) -> Column:
    """The boolean keep decision of :func:`stratified_sample` as a reusable
    expression — audits (curation.audit) need the DECISION without the
    filter, so the sample and its explanation can never disagree."""
    h = hash_hex(
        F.concat(F.col(id_col).cast("string"), F.lit(":"), F.col(strata_col))
    )
    thr: Column | None = None
    for stratum, rate in sorted(rates.items()):
        cond = F.col(strata_col) == stratum
        lit = F.lit(threshold(rate))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    thr_col = thr.otherwise(F.lit(threshold(default))) if thr is not None else F.lit(
        threshold(default)
    )
    return h < thr_col


def hash_split(
    df: DataFrame,
    id_col: str,
    train: float = 0.8,
    val: float = 0.1,
    split_col: str = "split",
) -> DataFrame:
    """Train/val/test assignment by identity hash (remainder is test)."""
    h = hash_hex(F.col(id_col))
    return df.withColumn(
        split_col,
        F.when(h < threshold(train), "train")
        .when(h < threshold(train + val), "val")
        .otherwise("test"),
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    target: dict[str, float],
) -> DataFrame:
    """Resample to a target source mixture — the domain-weighting primitive
    of pretraining-data curation (e.g. "40% web, 30% code, 30% books").

    Computes per-stratum keep rates ``rate_s = C * target_s / count_s``
    with the largest feasible scale ``C = min_s(count_s / target_s)`` — the
    biggest corpus whose composition matches ``target`` exactly without
    upsampling any stratum — then keeps rows by identity hash against the
    derived per-stratum threshold. Strata absent from ``target`` drop.

    One count aggregation over the strata column (partial-aggregable, tiny
    result) broadcast back onto a pure projection+filter; the corpus itself
    never shuffles. Deterministic: same identity-hash primitive as
    :func:`deterministic_sample`, thresholds derived from exact counts.
    """
    tgt = F.create_map(
        *[F.lit(x) for kv in sorted(target.items()) for x in kv]
    )
    counts = (
        df.groupBy(F.col(strata_col).alias("_stratum"))
        .agg(F.count("*").alias("_n"))
        .withColumn("_target", tgt[F.col("_stratum")])
        .filter(F.col("_target").isNotNull())
        .withColumn("_cap", F.col("_n") / F.col("_target"))
    )
    # global min over the per-stratum counts — a window on the (tiny,
    # |strata|-row) aggregate, so no join appears in the plan at all
    scale = F.min("_cap").over(Window.partitionBy(F.lit(1)))
    rates = counts.select(
        "_stratum",
        (scale * F.col("_target") / F.col("_n")).alias("_rate"),
    )
    h = hash_hex(
        F.concat(F.col(id_col).cast("string"), F.lit(":"), F.col(strata_col))
    )
    bucket = F.floor(F.col("_rate") * _BUCKETS).cast("int")
    thr = F.when(bucket >= _BUCKETS, F.lit("g")).otherwise(
        F.lpad(F.conv(bucket.cast("string"), 10, 16), 4, "0")
    )
    return (
        df.join(
            F.broadcast(rates),
            df[strata_col] == F.col("_stratum"),
            "inner",
        )
        .filter(h < F.lower(thr))
        .drop("_stratum", "_rate")
    )


def temperature_rates(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    target_frac: float = 0.5,
) -> DataFrame:
    """Per-stratum keep rates for TEMPERATURE-scaled mixture sampling — the
    multilingual/pretraining rebalancing recipe (sample source s with
    probability ∝ n_s^alpha; alpha < 1 flattens the source distribution so
    low-resource sources are over-represented relative to their raw share,
    alpha = 1 reproduces natural proportions).

    ``rate_s = target_frac · N · n_s^alpha / (Z · n_s)`` with
    ``Z = Σ_s n_s^alpha`` — expected kept volume ≈ ``target_frac · N``,
    distributed across sources by the tempered weights. One-pass: rates
    are capped at 1 (a small source whose tempered share exceeds its size
    cannot be upsampled), and the excess is NOT redistributed — the
    standard one-shot approximation; iterate externally if exact volume
    under caps matters. Rates are rounded to 6 decimals so an external
    engine derives bit-identical thresholds (the Z sum's float
    accumulation order differs across engines; round-6 absorbs it).

    One count aggregation (partial-aggregable, |strata| rows) plus a
    one-row broadcast of (N, Z); the corpus itself is never touched.
    Returns ``(stratum, n, rate)``.
    """
    counts = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count("*").alias("n")
    )

    # sqrt for the canonical alpha=0.5: IEEE-correctly-rounded in every
    # engine, unlike pow(x, 0.5) (Java Math.pow makes no correct-rounding
    # guarantee) — so the DuckDB oracle's sqrt matches bit for bit.
    def _temp(col: Column) -> Column:
        if alpha == 0.5:
            return F.sqrt(col)
        return F.pow(col, F.lit(float(alpha)))

    tots = counts.agg(
        F.sum("n").alias("_N"),
        F.sum(_temp(F.col("n"))).alias("_Z"),
    )
    raw = (
        F.lit(float(target_frac))
        * F.col("_N")
        * _temp(F.col("n"))
        / F.col("_Z")
        / F.col("n")
    )
    return counts.crossJoin(F.broadcast(tots)).select(
        "stratum",
        "n",
        F.round(F.least(F.lit(1.0), raw), 6).alias("rate"),
    )


def temperature_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    alpha: float = 0.5,
    target_frac: float = 0.5,
) -> DataFrame:
    """Apply :func:`temperature_rates` deterministically: identity-hash
    each row against its stratum's derived threshold (same stratum-salted
    hash primitive as :func:`stratified_sample`, same in-frame
    rate→hex-threshold bridge as :func:`mixture_sample`). The corpus never
    shuffles — count aggregate broadcast onto a projection+filter.

    The rates frame is re-aliased to underscore-prefixed internals
    (``_stratum``/``_rate``, the :func:`mixture_sample` convention) before
    the join, so an input that already carries a ``stratum``, ``n``, or
    ``rate`` column is neither dropped nor made join-ambiguous."""
    rates = temperature_rates(df, strata_col, alpha, target_frac).select(
        F.col("stratum").alias("_stratum"), F.col("rate").alias("_rate")
    )
    h = hash_hex(
        F.concat(F.col(id_col).cast("string"), F.lit(":"), F.col(strata_col))
    )
    bucket = F.floor(F.col("_rate") * _BUCKETS).cast("int")
    thr = F.when(bucket >= _BUCKETS, F.lit("g")).otherwise(
        F.lpad(F.conv(bucket.cast("string"), 10, 16), 4, "0")
    )
    return (
        df.join(F.broadcast(rates), df[strata_col] == F.col("_stratum"))
        .filter(h < F.lower(thr))
        .drop("_stratum", "_rate")
    )


def cluster_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    train: float = 0.8,
    val: float = 0.1,
    split_col: str = "split",
    cluster_out: str | None = None,
) -> DataFrame:
    """Leakage-safe train/val/test assignment: split at NEAR-DUP-CLUSTER
    granularity — the split hash keys on the cluster id, so every member
    of a cluster lands in the same split. A doc-level :func:`hash_split`
    silently leaks: a test document whose near-duplicate sits in train is
    memorization measured as generalization. Feed ``clusters`` from any
    clustering the pipeline already ran (MinHash-LSH + connected
    components, SemDeDup cells, entity resolution) — ``(id, cluster_id)``
    rows; ids absent from ``clusters`` are their own singleton cluster
    (split by their own id — identical to doc-level hashing, which is
    leakage-safe for docs with no known duplicates by definition).

    Scale: one equi join of the corpus against the (id, cluster) frame —
    key-sized build side, broadcast or shuffled by size — then the same
    pure-projection hash assignment as :func:`hash_split`; fractions
    apportion CLUSTERS, so split sizes track fractions only as closely as
    the cluster-size distribution allows (a giant cluster moves whole).
    ``cluster_out`` optionally emits the effective split key (the cluster
    id, or the doc's own id for singletons) under that column name."""
    cl = clusters.select(
        F.col(id_col).alias("_cid"), F.col(cluster_col).alias("_cluster")
    )
    keyed = df.join(cl, df[id_col] == F.col("_cid"), "left").withColumn(
        "_skey", F.coalesce(F.col("_cluster"), F.col(id_col))
    )
    h = hash_hex(F.col("_skey").cast("string"))
    out = keyed.withColumn(
        split_col,
        F.when(h < threshold(train), "train")
        .when(h < threshold(train + val), "val")
        .otherwise("test"),
    )
    if cluster_out is not None:
        out = out.withColumn(cluster_out, F.col("_skey"))
    return out.drop("_cid", "_cluster", "_skey")


def unimax_rates(
    df: DataFrame,
    strata_col: str,
    budget_frac: float = 0.5,
    max_epochs: float = 2.0,
) -> DataFrame:
    """UniMax mixture allocation (Chung et al., ICLR 2023): distribute a
    token/document budget across sources as UNIFORMLY as possible subject
    to a per-source repetition cap — the principled successor to
    temperature sampling (which over-repeats low-resource sources
    unboundedly as alpha falls; UniMax caps every source at
    ``max_epochs`` passes and waterfills the rest).

    Closed-form waterfilling instead of the paper's sequential loop:
    with sources sorted by ``cap_s = n_s * max_epochs`` ascending, every
    source below the water level tau takes its full cap, every source
    above takes tau, where ``sum_s min(cap_s, tau) = B`` and
    ``B = floor(budget_frac * N)``. For each row the candidate level
    assuming that row starts the uncapped suffix is
    ``tau_i = (B - cum_caps_before_i) / (k - i + 1)``; candidates are
    valid iff ``tau_i <= cap_i``, the valid rows always form a suffix
    with decreasing candidates, so the true level is the MAX valid
    candidate (no valid row means the whole corpus fits under its caps —
    every source takes cap). Returns ``(stratum, n_docs, cap, alloc,
    epochs)`` with ``epochs = alloc / n_s`` in ``[0, max_epochs]`` — the
    per-source repetition factor a training-shard writer consumes.

    Determinism: the running cap sum accumulates in the total order
    ``(cap, stratum)``, identical in any engine, so every float is
    bit-reproducible (outputs still round to 6). Scale: one
    partial-aggregable count to |strata| rows, then windows over that
    strata-sized frame (single-partition by construction — bounded by
    the source vocabulary, never the corpus).
    """
    counts = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count("*").alias("n_docs")
    )
    tots = counts.agg(
        F.count("*").alias("_k"), F.sum("n_docs").alias("_N")
    )
    cap = F.col("n_docs") * F.lit(float(max_epochs))
    order = Window.orderBy(cap.asc(), F.col("stratum").asc())
    cumb = F.coalesce(
        F.sum(cap).over(
            order.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0.0),
    )
    b = F.floor(F.lit(float(budget_frac)) * F.col("_N")).cast("double")
    idx = F.row_number().over(order)
    tau_cand = (b - cumb) / (F.col("_k") - idx + 1)
    frame = counts.crossJoin(F.broadcast(tots)).select(
        "stratum",
        "n_docs",
        cap.alias("cap"),
        tau_cand.alias("_tau_cand"),
        (tau_cand <= cap).alias("_valid"),
    )
    tau = F.max(F.when(F.col("_valid"), F.col("_tau_cand"))).over(
        Window.partitionBy()
    )
    alloc = F.least(F.col("cap"), F.coalesce(tau, F.col("cap")))
    return frame.select(
        "stratum",
        "n_docs",
        F.round("cap", 6).alias("cap"),
        F.round(alloc, 6).alias("alloc"),
        F.round(alloc / F.col("n_docs"), 6).alias("epochs"),
    )

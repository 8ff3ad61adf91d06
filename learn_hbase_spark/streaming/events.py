"""Structured Streaming extensions (north-star; the reference is strictly
batch — SURVEY §2.8 — its 'incremental' mode is manual re-runs of idempotent
upserts).

The streaming analog of the reference's ingest is: file/Kafka source →
the same declarative transforms → idempotent sink. Watermarked windowed
aggregation replaces the driver-scheduled day loop; ``availableNow`` makes
the same query testable as a bounded run.

Arbitrary state uses ``applyInPandasWithState`` (``stateful_user_totals``,
``stateful_sessions_with_timeout``). Spark 4's successor API
(``transformWithStateInPandas`` — typed ValueState/ListState/MapState,
schema evolution) was evaluated and is unusable in this container: its
driver worker imports ``google.protobuf``, which is not installed (verified:
STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE / ImportError). On a cluster
with protobuf present the ``stateful_user_totals`` processor ports 1:1
(ValueState replaces the GroupState tuple); the operator semantics and
tests here are unchanged by that swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import EVENTS


# Spark's spillable state store (built-in since 3.2; rocksdbjni ships in
# Spark's jars). The default HDFS-backed provider keeps every key of every
# stateful operator (session windows, timers, stream-stream join buffers,
# dedup sets) in executor HEAP — at 100 TB-scale key cardinality that is an
# OOM, not a tuning problem. RocksDB keeps working set in memory and spills
# the rest to local disk, bounding heap regardless of key count.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def use_rocksdb_state_store(spark: SparkSession, enable: bool = True) -> None:
    """Config-gate the RocksDB state store for subsequent streaming queries.

    The provider is read per-query at START, so call this before
    ``.start()``; already-running queries keep their provider, and a
    query's checkpoint pins its provider for the life of that checkpoint
    (don't flip providers on an existing checkpoint dir). ``enable=False``
    restores the default (HDFS-backed in-heap) provider — the local-mode
    fallback where state fits comfortably in one JVM's heap.
    """
    if enable:
        spark.conf.set(_PROVIDER_CONF, ROCKSDB_PROVIDER)
    else:
        spark.conf.unset(_PROVIDER_CONF)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based event stream with the testdata `events` schema. At
    production scale the same plan reads Kafka; only this reader changes."""
    reader = spark.readStream.schema(EVENTS)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_event_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling-window counts with late-data handling.

    The watermark bounds state: rows later than `watermark` are dropped and
    their windows finalized — the streaming replacement for the reference's
    'rerun the whole day' recovery model.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_window_counts(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows per user: a session closes after ``gap``
    of inactivity (``F.session_window`` — dynamic, data-driven windows, not
    fixed tumbling buckets). The streaming twin of the batch ``sessionize``
    query's lag+running-sum formulation; the watermark both bounds session
    state and finalizes sessions so they can be emitted append-mode.

    Works identically over a batch DataFrame (session_window is engine-
    native in both modes) — the tests exploit that to cross-check streaming
    output against the batch result on the same files.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def run_bounded(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """Drain everything currently available and stop (testable streaming)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: first occurrence per key wins, with state
    bounded by the watermark (keys older than the watermark are evicted —
    without it, dedup state grows forever). The streaming twin of the batch
    D1 first-wins: the reference re-runs idempotent upserts to get the same
    effect (SURVEY §2.8); here the engine deduplicates exactly-once inside
    the stream."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(keys)


def event_day_cells(events: DataFrame) -> DataFrame:
    """Map events to wide-table cells the way the reference's fact load
    pivots on write (RdlETL.java:120-122): rowkey = zero-padded user id
    (4-char prefix → partition pruning), family ``bmz``, one qualifier per
    calendar day (``yyyyMMdd``), value = the reading rendered as a string.
    Several events on the same day collapse to the day's max value before
    the write, mirroring the reference's one-cell-per-day model. The
    aggregation is per micro-batch: like HBase puts, a day split across
    two batches resolves latest-batch-wins, so ingest should trigger on
    day-atomic chunks (the reference's per-day loop gives it the same
    atomicity, RdlETL.java:45-47)."""
    return (
        events.groupBy(
            F.lpad(F.col("user_id").cast("string"), 8, "0").alias("rowkey"),
            F.date_format("ts", "yyyyMMdd").alias("qualifier"),
        )
        .agg(F.max("value").alias("v"))
        .select(
            "rowkey",
            F.lit("bmz").alias("family"),
            "qualifier",
            F.col("v").cast("string").alias("value"),
        )
    )


def upsert_stream_to_widetable(
    stream: DataFrame,
    table,
    checkpoint_dir: str,
    cell_fn=event_day_cells,
    maintain_indexes: tuple = (),
) -> None:
    """Incremental ingest: drain the stream into a ``WideTable`` via
    ``foreachBatch``, one latest-wins put per micro-batch.

    This is the Spark-native form of the reference's 'incremental' mode —
    manually re-running idempotent HBase upserts per day (SURVEY §2.8) —
    with the engine supplying what the reference hand-rolls: exactly-once
    micro-batch tracking (checkpoint), batching/backpressure, and
    latest-wins resolution at read (WideTable versions ≙ HBase cell
    timestamps). Re-processing a batch after failure lands the same cells
    with a newer version: the read result is unchanged, so the pipeline is
    idempotent end-to-end.

    ``maintain_indexes``: ``(family, qualifier)`` pairs whose secondary
    index rides the write path — after each put, ``update_index``
    appends an upsert-sized delta for the batch's touched rowkeys
    (Phoenix couples index maintenance to the write RPC; this is the
    micro-batch analogue), so lookups stay FRESH between full rebuilds
    instead of tripping the staleness guard after the first drain. Each
    named index must exist (``build_index``) before the stream starts.
    Replay-safe like the put itself: a replayed batch appends a
    duplicate delta whose entries collapse in the lookup's distinct +
    read-repair."""

    q = (
        stream.writeStream.foreachBatch(
            lambda batch_df, batch_id: upsert_batch(
                table, batch_df, batch_id, cell_fn, maintain_indexes
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def upsert_batch(
    table,
    batch_df: DataFrame,
    batch_id: int,
    cell_fn,
    maintain_indexes: tuple = (),
) -> None:
    """One micro-batch of :func:`upsert_stream_to_widetable` — module-level
    so replay semantics are directly testable: foreachBatch is
    at-least-once, and this sink is replay-safe because ``WideTable.put``
    is a latest-wins upsert — a replayed batch lands the SAME cells again
    with a newer version, and the latest-wins read resolves to identical
    values (asserted by the parametrized replay test in
    tests/test_streaming.py). Index maintenance happens AFTER the put
    (the index must never lead the data), per indexed pair, keyed by the
    batch's touched rowkeys only — and because the keys come from the
    SAME cells frame the put landed, coverage is guaranteed by
    construction (the coupling update_index's contract asks of manual
    callers). The cells lineage is localCheckpointed once per batch: the
    emptiness probe, the put, and each index's touched-key scan would
    otherwise re-execute an aggregating cell_fn 2+len(maintain_indexes)
    times (checkpoint blocks are GC-reclaimed when the batch frame drops,
    unlike CacheManager entries — safe for long-running streams)."""
    cells = cell_fn(batch_df).localCheckpoint()
    if not cells.take(1):
        return
    table.put(cells)
    for family, qualifier in maintain_indexes:
        touched = (
            cells.filter(
                (F.col("family") == family)
                & (F.col("qualifier") == qualifier)
            )
            .select("rowkey")
            .distinct()
        )
        table.update_index(family, qualifier, touched)


def stateful_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running totals (event count, value sum) that survive across micro-
    batches in the state store.

    This is the extension point the reference cannot express at all (its
    'state' is the HBase table itself, re-read per run — SURVEY §2.8): an
    arbitrary per-key accumulator maintained by the engine with exactly-once
    semantics. State is one tiny row per user; partitioning is the groupBy
    hash shuffle, so a 1000-executor cluster shards the state store by key.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _update(key: tuple, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [total]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def click_purchase_stream_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: each click pairs with the same
    user's purchases that happen within ``[click_ts, click_ts + max_gap]``.

    Both sides carry watermarks and the join condition bounds event time in
    BOTH directions, so the engine can reason about when a buffered row can
    never match again and evict it — unbounded-state stream joins are
    rejected by Spark for exactly this reason. State per side is bounded by
    ``watermark + max_gap`` of data, sharded by the equi-key's hash shuffle
    across executors. The batch twin (same plan minus watermarks) is the
    ``range_join_events`` family; tests cross-check against it.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {max_gap}"))
    )
    return c.join(p, cond, "inner").select(
        F.col("c_user_id").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def enrich_stream_with_dim(
    stream: DataFrame, dim: DataFrame, on: str = "user_id"
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    (batch) dimension as of that trigger — the streaming analog of the
    reference's client-heap HashMap lookup (RdlETL.java:53-79). The static
    side is re-resolved per micro-batch, so a dim refresh lands without
    restarting the query; Catalyst broadcasts it when small. No watermark
    needed: the static side never buffers state."""
    return stream.join(F.broadcast(dim), on, "left")


def dedup_stream_within_watermark(
    stream: DataFrame,
    keys: list[str],
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming dedup tolerant of REORDERED duplicates:
    ``dropDuplicatesWithinWatermark`` keeps one row per key among
    duplicates whose event times land within the watermark of each other,
    even when the duplicate's timestamp differs (retransmits with fresh
    timestamps — the case plain dropDuplicates(keys + ts) misses). State
    still evicts on the watermark."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def stateful_sessions_with_timeout(
    stream: DataFrame, gap_seconds: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """Timer-driven session aggregation: a custom stateful operator.

    Sessions that close WITHIN a batch (a gap-separated successor arrives)
    emit immediately; the trailing open session per user is carried in
    state and emitted by an event-time TIMEOUT once the watermark passes
    ``last_event + gap`` — ``GroupState.setTimeoutTimestamp`` is the
    expiry-callback primitive (cart abandonment, device offline detection)
    that plain windowed aggregation cannot express. Unlike
    ``session_window_counts`` (engine-managed windows) the state here is
    arbitrary: first/last event time plus any accumulator you need.
    State: one row per ACTIVE user, evicted on emit.

    NOTE: Spark 4's successor API (``transformWithStateInPandas``) is the
    modern form, but its Python driver worker needs protobuf, which this
    environment lacks — ``applyInPandasWithState`` is the supported path
    here and carries identical semantics for this pattern.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def _row(key, s):
        start_us, end_us, n, total = s
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(end_us, unit="us")],
                "n_events": [n],
                "sum_value": [total],
            }
        )

    def _update(key: tuple, pdfs, state: GroupState):
        if state.hasTimedOut:
            s = state.get
            state.remove()
            yield _row(key, s)
            return
        # microsecond precision end-to-end: the event table carries µs
        # timestamps and session bounds must round-trip exactly
        pairs = []
        for pdf in pdfs:
            ts_us = pdf["ts"].astype("int64") // 1_000
            vals = pdf["value"].fillna(0.0)
            pairs.extend(zip(ts_us.tolist(), vals.tolist()))
        pairs.sort()
        # split the batch into gap-separated sessions locally
        sessions = []
        for ts, v in pairs:
            if sessions and ts - sessions[-1][1] <= gap_us:
                s = sessions[-1]
                sessions[-1] = (s[0], ts, s[2] + 1, s[3] + v)
            else:
                sessions.append((ts, ts, 1, v))
        if state.exists:
            prev = tuple(state.get)
            if sessions and sessions[0][0] - prev[1] <= gap_us:
                s0 = sessions[0]
                sessions[0] = (
                    min(prev[0], s0[0]), max(prev[1], s0[1]),
                    prev[2] + s0[2], prev[3] + s0[3],
                )
            else:
                # the carried session is gap-closed by the new data
                yield _row(key, prev)
        # sessions closed WITHIN the batch (another session follows) are
        # final up to watermark-late bridging (bounded by the stream's
        # watermark, same guarantee window as the engine's session_window)
        for s in sessions[:-1]:
            yield _row(key, s)
        last = sessions[-1]
        state.update(last)
        state.setTimeoutTimestamp(last[1] // 1000 + gap_seconds * 1000)

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=(
                "user_id long, session_start timestamp, "
                "session_end timestamp, n_events long, sum_value double"
            ),
            stateStructType=(
                "start_us long, end_us long, n long, total double"
            ),
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def neardup_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    accepted_dir: str,
    checkpoint_dir: str,
    num_hashes: int = 8,
    bands: int = 4,
) -> None:
    """Streaming near-duplicate-gated corpus ingest: every arriving
    micro-batch of documents is checked (MinHash-LSH) against the
    PERSISTED band index of everything accepted so far, plus itself;
    only non-duplicates are appended, and their bands extend the index.

    This is the 100 TB ingest shape end-to-end: per batch the work is
    O(batch) — the batch is shingled/banded fresh, the history side is
    an index lookup (band-key equi-join against the bucketed band
    store), and the corpus is NEVER re-scanned. Batch-mode twin:
    ``dedup.minhash_incremental_pairs`` (the ``minhash_incremental``
    oracle query); exact-dedup streaming twin: ``dedup_stream``.

    foreachBatch is the right tool (not a stateful operator): the state
    here is a TABLE (the band index) that must outlive the stream, serve
    batch queries, and be compactable — `applyInPandasWithState` state
    is opaque to everything but the stream that owns it.

    Replay note: foreachBatch is at-least-once — both outputs must
    therefore be OVERWRITE-by-batch, not append: every row is tagged
    with the batch id, both directories are PARTITIONED by ``_batch``,
    and each write is a dynamic partition overwrite that replaces only
    its own batch's partition. A replayed batch recomputes the same
    accept/reject decision (the collision join reads the index with
    same-batch partitions pruned out, so its own earlier bands cannot
    reject it) and overwrites its own partition with the same rows —
    exactly-once output from an at-least-once sink. The batch body is
    :func:`neardup_ingest_batch` (module-level so the replay path is
    directly testable by re-invoking it with the same batch id).

    Both output dirs are ownership-guarded (``_claim_stream_output``):
    their ``_batch`` numbers are meaningful only relative to THIS
    stream's checkpoint counter, so a second stream (or a reset
    checkpoint) sharing either dir would silently cross-overwrite the
    accepted corpus / the band index.
    """
    _claim_stream_output(spark, accepted_dir, checkpoint_dir, "_ingest_owner")
    _claim_stream_output(spark, index_dir, checkpoint_dir, "_ingest_owner")
    docs_schema = "doc_id long, text string"
    stream = (
        spark.readStream.format("json")
        .schema(docs_schema)
        .load(input_dir)
    )

    q = (
        stream.writeStream.foreachBatch(
            lambda batch, batch_id: neardup_ingest_batch(
                batch, batch_id, index_dir, accepted_dir, num_hashes, bands
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def neardup_ingest_file_stream(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    accepted_dir: str,
    checkpoint_dir: str,
    pattern: str = "*.txt",
    max_files_per_trigger: int | None = None,
    num_hashes: int = 8,
    bands: int = 4,
) -> None:
    """:func:`neardup_ingest_stream` fed from a raw crawl DROP ZONE — the
    shape a real corpus landing area has: documents arrive as text FILES
    in a growing directory, not as parquet-shaped batches. The streaming
    ``text`` source's checkpointed file listing ingests ONLY new files on
    each drain (already-seen files are never re-read — the O(new)
    property at the file level), ``wholetext`` makes one document per
    file, ``pathGlobFilter`` prunes non-corpus files at the LISTING, and
    ``maxFilesPerTrigger`` bounds a micro-batch so a backlogged drop zone
    drains in executor-sized bites instead of one giant batch.

    Document identity matches the batch file edge
    (``sources.files.read_text_docs``): ``doc_id = md5(path)`` — 128-bit,
    collision-safe at crawl scale, stable across drains so a replayed
    file keeps its id. The per-batch gate/land body is the SAME
    :func:`neardup_ingest_batch` (string id type); everything proven for
    the parquet-shaped stream — replay idempotence, engine-recovery
    restart, exactly-once landing, output-dir ownership — holds here
    because the body is shared.
    """
    _claim_stream_output(spark, accepted_dir, checkpoint_dir, "_ingest_owner")
    _claim_stream_output(spark, index_dir, checkpoint_dir, "_ingest_owner")
    reader = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", pattern)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(input_dir)
    pathcol = F.input_file_name()
    docs = raw.select(
        F.md5(pathcol.cast("binary")).alias("doc_id"),
        F.col("value").alias("text"),
        pathcol.alias("path"),
    )
    q = (
        docs.writeStream.foreachBatch(
            lambda batch, batch_id: neardup_ingest_batch(
                batch, batch_id, index_dir, accepted_dir, num_hashes,
                bands, id_type="string",
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def curation_ingest_file_stream(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    curated_dir: str,
    checkpoint_dir: str,
    pattern: str = "*.txt",
    max_files_per_trigger: int | None = None,
    min_tokens: int = 5,
    lm_quantile: float | None = None,
    num_hashes: int = 8,
    bands: int = 4,
    gopher_quality: bool = False,
    gopher_quality_kwargs: dict | None = None,
    lm_model_dir: str | None = None,
    lm_min_logprob: float | None = None,
) -> None:
    """The full CCNet loop at the streaming edge (VERDICT r8 task 5):
    a growing crawl drop zone is CURATED incrementally, not just
    near-dup-filtered — each drain runs quality gate → LSH near-dup gate
    against the persisted index → (optional) bigram-LM quality band over
    the batch's survivors, landing only curated documents.

    Reader contract is :func:`neardup_ingest_file_stream`'s: checkpointed
    file listing (only new files per drain), ``wholetext`` one-doc-per-
    file, ``pathGlobFilter`` listing-level pruning, ``maxFilesPerTrigger``
    backpressure, ``doc_id = md5(path)``. The per-batch body is
    :func:`curation_ingest_batch` (module-level, replay-testable).

    The LM threshold is BATCH-LOCAL: the ``lm_quantile`` percentile of
    the batch's own survivor scores (CCNet's corpus-level threshold,
    approximated per micro-batch — the right trade at a streaming edge,
    where a corpus-level quantile would re-scan history every drain; a
    nightly batch re-curation with the corpus-level threshold is the
    compaction-style complement). Requires ``min_tokens >= 2`` when the
    band is on (every banded doc must be scoreable) — enforced by the
    pipeline's own guard.

    ``gopher_quality`` adds the Gopher rule gate (Rae 2021 §A1.1)
    between the token gate and the LSH gate — a pure per-row projection,
    so it streams for free; a doc failing the rules is a deterministic
    content property (a future copy fails identically), so rule-dropped
    docs never need to enter the dedup index.

    ``lm_model_dir`` adds the FROZEN-model LM band (the actual CCNet
    deployment: ``operators.corpus.freeze_bigram_lm`` fits the model on
    a frozen reference corpus offline; every drain scores against those
    materialized count tables) between the Gopher gate and the LSH gate.
    Unlike the batch-local ``lm_quantile`` band — whose self-trained
    threshold drifts with each drain's composition and therefore runs
    AFTER dedup, with dropped docs still indexed — a frozen model plus a
    frozen absolute threshold makes the LM verdict a deterministic
    content property, exactly like the Gopher rules, so frozen-band
    rejects are dropped BEFORE the index and a future copy is re-rejected
    identically by content. The cutoff is ``lm_min_logprob`` when given,
    else the ``_thr`` calibrated at freeze time (error if neither
    exists). The threshold is resolved ONCE here at stream setup (one
    1-row meta read) and closed over; the Zipf-truncated count tables
    are lazy scans Catalyst broadcasts per drain. Both bands may run
    together: frozen (absolute floor, pre-dedup) then batch-local
    (relative tail trim over this drain's survivors, post-dedup).
    """
    from ..operators.corpus import load_bigram_lm
    from ..pipeline.curation import _require_scoreable

    _require_scoreable(
        min_tokens, lm_quantile if lm_model_dir is None else 0.0
    )
    _claim_stream_output(spark, curated_dir, checkpoint_dir, "_ingest_owner")
    _claim_stream_output(spark, index_dir, checkpoint_dir, "_ingest_owner")
    lm_cutoff = lm_k = None
    if lm_model_dir is not None:
        _, _, _, lm_k, frozen_thr = load_bigram_lm(spark, lm_model_dir)
        lm_cutoff = lm_min_logprob if lm_min_logprob is not None else frozen_thr
        if lm_cutoff is None:
            raise ValueError(
                "frozen LM band needs a cutoff: pass lm_min_logprob or "
                "freeze the model with threshold_quantile set"
            )
    reader = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", pattern)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(input_dir)
    pathcol = F.input_file_name()
    docs = raw.select(
        F.md5(pathcol.cast("binary")).alias("doc_id"),
        F.col("value").alias("text"),
        pathcol.alias("path"),
    )
    q = (
        docs.writeStream.foreachBatch(
            lambda batch, batch_id: curation_ingest_batch(
                batch, batch_id, index_dir, curated_dir,
                min_tokens=min_tokens, lm_quantile=lm_quantile,
                num_hashes=num_hashes, bands=bands,
                gopher_quality=gopher_quality,
                gopher_quality_kwargs=gopher_quality_kwargs,
                lm_model_dir=lm_model_dir, lm_min_logprob=lm_cutoff,
                lm_model_k=lm_k,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def curation_ingest_batch(
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    curated_dir: str,
    min_tokens: int = 5,
    lm_quantile: float | None = None,
    num_hashes: int = 8,
    bands: int = 4,
    gopher_quality: bool = False,
    gopher_quality_kwargs: dict | None = None,
    lm_model_dir: str | None = None,
    lm_min_logprob: float | None = None,
    lm_model_k: float = 1.0,
) -> None:
    """One micro-batch of :func:`curation_ingest_file_stream`: quality
    gate → optional Gopher rule gate (scan-fused projection) → optional
    FROZEN-model LM band (absolute cutoff against materialized count
    tables) → shared LSH gate (:func:`_neardup_gate`) → optional
    batch-local LM band → land curated rows and extend the band index,
    both as dynamic ``_batch``-partition overwrites (replay-idempotent
    under foreachBatch's at-least-once contract, same argument as
    :func:`neardup_ingest_batch`).

    The index records every quality-gated non-duplicate the BATCH-LOCAL
    band then drops — that verdict depends on the drain's composition,
    so a future near-duplicate must be rejected as a duplicate rather
    than re-curated under a luckier batch. Frozen-band rejects, by
    contrast, are dropped BEFORE the index (with the Gopher rejects):
    the frozen model + frozen threshold make their verdict a
    deterministic content property, so a future copy re-fails on content
    and needs no identity record."""
    from ..functions import text as T
    from ..operators.corpus import bigram_lm_score_tables
    from ..pipeline.curation import _lm_band_ids

    gated = batch.filter(T.token_count(F.col("text")) >= min_tokens)
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
    if lm_model_dir is not None:
        if lm_min_logprob is None:
            raise ValueError(
                "lm_model_dir requires a resolved lm_min_logprob cutoff"
            )
        # all three model frames are LAZY scans re-planned per drain —
        # cheap (Zipf-truncated tables, Catalyst broadcasts them) and,
        # unlike load_bigram_lm, no per-drain driver collect: the frozen
        # scalars (cutoff, k) were resolved once at stream setup and ride
        # the closure; the 1-row vocab frame joins as a broadcast scan
        spark = batch.sparkSession
        c2 = spark.read.parquet(f"{lm_model_dir}/c2")
        c1 = spark.read.parquet(f"{lm_model_dir}/c1")
        vocab_n = spark.read.parquet(f"{lm_model_dir}/meta").select("_v")
        frozen_keep = (
            bigram_lm_score_tables(
                gated, c2, c1, vocab_n, "text", "doc_id", k=lm_model_k
            )
            # round-6 scores vs a round-4 threshold: the cross-engine /
            # cross-run parity posture every band stage uses
            .filter(F.col("avg_logprob") >= F.lit(float(lm_min_logprob)))
            .select("doc_id")
        )
        gated = gated.join(frozen_keep, "doc_id", "left_semi")
    accepted, bands_kept = _neardup_gate(
        gated, batch_id, index_dir, num_hashes, bands, id_type="string"
    )
    curated = accepted
    if lm_quantile is not None:
        # pin=False: a long-running stream calls this every drain, and a
        # per-batch persist would accumulate one CacheManager entry per
        # micro-batch for the life of the session; batches are small, so
        # the band's double reference just recomputes
        curated = accepted.join(
            _lm_band_ids(accepted, lm_quantile, pin=False),
            "doc_id",
            "left_semi",
        )
    (
        curated.withColumn("_batch", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch")
        .parquet(curated_dir)
    )
    (
        bands_kept.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch")
        .parquet(index_dir)
    )


# Band-index layout on disk: parquet partitioned by the writing batch id.
# The data columns are minhash_bands' output; _batch is the partition key.
# The id column's type follows the ingest edge: long for parquet-shaped
# document batches, a 32-hex md5(path) string for the raw-file edge
# (sources.files contract) — hence the parameterized form below.
def _neardup_index_schema(id_type: str) -> str:
    return f"_id {id_type}, _bk string, _batch long"


_NEARDUP_INDEX_SCHEMA = _neardup_index_schema("long")


def _dir_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FileSystem existence probe (works for any supported scheme,
    not just local paths). Used instead of try/except around the read:
    a corrupted index (bad parquet footer, permission/filesystem error)
    must FAIL the batch, not silently disable the against-history check."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def neardup_ingest_batch(
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    accepted_dir: str,
    num_hashes: int = 8,
    bands: int = 4,
    id_type: str = "long",
) -> None:
    """One micro-batch of :func:`neardup_ingest_stream` /
    :func:`neardup_ingest_file_stream`: LSH-gate the batch against the
    persisted band index and itself, then land BOTH outputs as a dynamic
    partition overwrite of this batch's own ``_batch`` partition —
    replay-idempotent under foreachBatch's at-least-once contract.
    ``id_type`` matches the ingest edge's doc_id type (long for
    parquet-shaped batches, string for the md5(path) file edge)."""
    accepted, bands_kept = _neardup_gate(
        batch, batch_id, index_dir, num_hashes, bands, id_type
    )
    (
        accepted.withColumn("_batch", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch")
        .parquet(accepted_dir)
    )
    (
        bands_kept.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch")
        .parquet(index_dir)
    )


def _neardup_gate(
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    num_hashes: int,
    bands: int,
    id_type: str,
) -> tuple[DataFrame, DataFrame]:
    """The shared LSH gate of the streaming ingest bodies: check ``batch``
    against the persisted band index (same-batch partitions pruned out, so
    a replay cannot reject itself) and against itself (min id per
    colliding bucket wins). Returns ``(accepted, bands_kept)`` — the
    non-duplicate rows and their ``_batch``-tagged band rows for the index
    extension. Pure lineage, no writes: the callers own landing."""
    from ..operators import dedup as D

    s = batch.sparkSession
    bands_new = D.minhash_bands(
        batch, "text", "doc_id", num_hashes, bands
    ).withColumn("_batch", F.lit(batch_id))
    if _dir_exists(s, index_dir):
        # explicit schema: skips footer-based inference (valid on an
        # empty/partition-less dir) while still failing loudly on real
        # corruption at scan time; the _batch filter is partition pruning.
        idx = s.read.schema(_neardup_index_schema(id_type)).parquet(
            index_dir
        ).filter(
            F.col("_batch") != batch_id
        )
        # against-history collisions (index-lookup join on band key)
        hist_hits = (
            bands_new.select(F.col("_id").alias("doc_id"), "_bk")
            .join(idx.select("_bk"), "_bk")
            .select("doc_id")
            .distinct()
        )
    else:
        hist_hits = batch.select("doc_id").limit(0)
    # intra-batch collisions: min id per colliding bucket wins
    intra = D.minhash_bucket_pairs(
        batch, "text", "doc_id", num_hashes, bands
    ).select(F.col("id_b").alias("doc_id")).distinct()
    rejected = hist_hits.union(intra).distinct()
    accepted = batch.join(rejected, "doc_id", "left_anti")
    bands_kept = bands_new.join(
        rejected.withColumnRenamed("doc_id", "_id"), "_id", "left_anti"
    )
    return accepted, bands_kept


def ann_index_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    artifact_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Maintain a frozen IVF-PQ index from a streaming embedding drop
    zone: parquet-shaped batches of ``(vec_id, embedding)`` arrive in a
    growing directory; each drain encodes ONLY the new vectors against
    the artifact's frozen quantizers and lands their cells/codes as
    replay-idempotent delta segments (body:
    ``operators.similarity.ann_index_ingest_batch`` — module-level, so
    the at-least-once replay path is directly testable). The streaming
    complement of the batch-mode :func:`~learn_hbase_spark.operators.
    similarity.extend_ivf_pq`, and the ANN sibling of
    :func:`upsert_stream_to_widetable`'s ``maintain_indexes`` path: the
    checkpointed file listing gives O(new-files) drains, probes see
    drained vectors immediately via the base ∪ delta union, and the
    stack is self-bounding — past
    ``similarity.ANN_DELTA_COMPACT_THRESHOLD`` delta partitions the
    drain body folds it into base (``compact_ivf_pq``) before the next
    drain starts, so an unattended long-running stream never grows the
    probe plan or its file listing without limit. The artifact must
    exist (``freeze_ivf_pq``) before the stream starts — quantizers are
    trained once, never per drain."""
    from ..operators.similarity import ann_index_ingest_batch

    schema = "vec_id long, embedding array<double>"
    # recursiveFileLookup: each arriving shard is itself a parquet
    # DIRECTORY (that's how every writer lays them down); without it the
    # file source lists only top-level files and drains nothing
    reader = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(input_dir)
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, batch_id: ann_index_ingest_batch(
                batch, batch_id, artifact_dir
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _claim_stream_output(
    spark: SparkSession, output_dir: str, checkpoint_dir: str, marker: str
) -> None:
    """Ownership guard for streams that land ``_batch``-partitioned
    dynamic partition overwrites: ``_batch`` numbers come from ONE
    checkpoint's counter, so the output dir is meaningful only relative
    to that checkpoint. Stamps ``{output_dir}/{marker}`` with the
    checkpoint path on first use; REFUSES an output dir whose ``_batch=*``
    partitions are owned by a different checkpoint (two streams would
    silently cross-overwrite each other's partitions) or by a checkpoint
    that has since been deleted/reset (the fresh counter restarts at 0,
    so partitions the new run never rewrites would linger as stale
    duplicates for any consumer unioning the directory).

    Migration: partitions with NO sidecar (written by a pre-guard
    version of the stream) are ADOPTED when the restarting checkpoint
    has committed batches — that is the legitimate owner resuming, and
    refusing would strand the accumulated state; an uncommitted (fresh
    or reset) checkpoint over an unowned populated dir still refuses.
    The residual risk — an unrelated committed stream adopting a
    pre-guard dir it never wrote — is a misconfiguration the pre-guard
    code corrupted silently; this path at least stamps it visibly."""
    from ..storage.artifact import (
        delta_partition_count,
        hadoop_fs,
        read_text_sidecar,
        write_text_sidecar,
    )

    owner_p = f"{output_dir}/{marker}"
    # progress = the OFFSETS log, not commits: offsets/N is written
    # BEFORE batch N runs, so a crash between the output landing and the
    # commit record leaves offsets present — that restart must be
    # allowed (the engine replays batch N and the dynamic partition
    # overwrite rewrites its own _batch=N), or the stream's very first
    # mid-batch crash wedges it. A deleted/reset checkpoint has neither
    # offsets nor commits and still refuses.
    has_progress = False
    for sub in ("offsets", "commits"):
        fs, jp = hadoop_fs(spark, f"{checkpoint_dir}/{sub}")
        if fs.exists(jp) and fs.listStatus(jp):
            has_progress = True
            break
    if delta_partition_count(spark, output_dir, prefix="_batch=") > 0:
        owner = read_text_sidecar(spark, owner_p)
        if owner is None and has_progress:
            # migration: a dir written by the pre-guard version of this
            # stream has partitions but no sidecar; a checkpoint WITH
            # committed batches restarting over it is the legitimate
            # owner resuming (its counter continues where the partitions
            # left off) — adopt, don't strand the accumulated state
            write_text_sidecar(spark, owner_p, checkpoint_dir)
            return
        if owner != checkpoint_dir:
            raise ValueError(
                f"output dir {output_dir} already holds _batch=* results "
                f"owned by {owner or 'no recorded checkpoint'} — two "
                "streams must not share one output dir (their checkpoint "
                "batch counters would silently cross-overwrite); use a "
                "fresh output dir per stream"
            )
        if not has_progress:
            raise ValueError(
                f"output dir {output_dir} holds results from checkpoint "
                f"{checkpoint_dir}, but that checkpoint has no committed "
                "batches or recorded offsets — it was deleted/reset, so "
                "its restarted batch counter would leave stale _batch=* "
                "partitions the new run never rewrites; clear the output "
                "dir (or use a fresh one) before restarting from an "
                "empty checkpoint"
            )
    else:
        write_text_sidecar(spark, owner_p, checkpoint_dir)


def media_feature_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    pattern: str | None = None,
    max_files_per_trigger: int | None = None,
) -> None:
    """Streaming multimodal feature extraction over a media DROP ZONE —
    the file edge of the multimodal pipeline run continuously: media
    files land in a directory (the crawl/ingest pattern), each drain
    reads ONLY the new files via the checkpointed ``binaryFile`` listing
    and decodes them with the REAL codec kernels
    (``operators.multimodal``): BMP → dimensions + per-channel pixel
    means, WAV → sample rate / count / RMS / peak, AVI → geometry /
    frame count / per-channel means over all frames; everything else —
    opaque kinds AND media formats the real codecs can't parse (jpg/png/
    mp3/mp4/…, which ``_MEDIA_EXT`` still classifies as image/audio/
    video) — gets the format-agnostic payload profile row (byte length),
    with ``decode_note='undecodable_format'`` marking the media-kind
    rows that arrived in a format this build can't decode. Routing is BY
    EXTENSION, so one JPEG dropped in a mixed zone can never wedge the
    stream in a decode-raise replay loop; a corrupt ``.bmp``/``.wav``/
    ``.avi`` still FAILS THE DRAIN loudly (a malformed payload in a
    decodable format is data the pipeline must see, not silently skip).
    Results land as ``(media_id, kind, path, n_bytes, …features,
    n_frames, decode_note)`` — schema v2, version-stamped on the output
    dir so a resumed pre-v2 dir refuses instead of mixing parquet
    schemas — under this batch's own ``_batch`` partition (dynamic partition
    overwrite → at-least-once replays rewrite, never double-append — the
    ANN serving contract), and the output dir is ownership-guarded
    against a second stream or a reset checkpoint. ``media_id`` is
    ``md5(path)`` (the ``read_binary_files`` id rule — collision-safe at
    crawl scale)."""
    from ..operators.multimodal import (
        audio_features,
        image_pixel_features,
        video_summary_features,
    )
    from ..sources.files import _MEDIA_EXT
    from ..storage.artifact import (
        delta_partition_count,
        read_text_sidecar,
        write_text_sidecar,
    )

    _claim_stream_output(spark, output_dir, checkpoint_dir, "_media_owner")
    # output-SCHEMA version guard: v2 added decode_note/n_frames, so
    # partitions written by an older build would give the union dir a
    # nondeterministic schema (parquet infers from one sampled footer).
    # Features are derived data — recomputable — so a version mismatch
    # REFUSES toward a fresh dir rather than adopting mixed schemas.
    schema_p = f"{output_dir}/_media_schema"
    if delta_partition_count(spark, output_dir, prefix="_batch=") > 0:
        ver = read_text_sidecar(spark, schema_p)
        if ver != "v2":
            raise ValueError(
                f"output dir {output_dir} holds feature partitions with "
                f"schema {ver or 'v1 (pre-decode_note)'} — this build "
                "writes schema v2 (decode_note, n_frames), and mixing "
                "versions in one dir reads nondeterministically; use a "
                "fresh output dir (features are recomputable from the "
                "drop zone)"
            )
    else:
        write_text_sidecar(spark, schema_p, "v2")

    # the binaryFile source's fixed schema (required for readStream)
    schema = (
        "path string, modificationTime timestamp, length long, "
        "content binary"
    )
    reader = spark.readStream.format("binaryFile").schema(schema)
    if pattern is not None:
        reader = reader.option("pathGlobFilter", pattern)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(input_dir)

    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    kind_map = F.create_map(
        *[F.lit(x) for kv in _MEDIA_EXT.items() for x in (kv[0], kv[1][0])]
    )

    def _body(batch, batch_id: int) -> None:
        if not batch.take(1):
            return
        media = batch.select(
            F.md5(F.col("path").cast("binary")).alias("media_id"),
            F.coalesce(kind_map[ext], F.lit("binary")).alias("kind"),
            ext.alias("_ext"),
            F.col("content").alias("payload"),
            F.col("path"),
            F.col("length").alias("n_bytes"),
        ).localCheckpoint()  # three kind-split consumers; list/decode once
        null_i = F.lit(None).cast("int")
        null_l = F.lit(None).cast("long")
        null_d = F.lit(None).cast("double")
        null_s = F.lit(None).cast("string")
        # decode routing is by EXTENSION (the formats the real codecs
        # parse), not by kind — _MEDIA_EXT classifies jpg/mp3/… as
        # image/audio, and sending those through the BMP/WAV decoders
        # would fail every drain forever on one undecodable file
        decodable = (
            ((F.col("kind") == "image") & (F.col("_ext") == "bmp"))
            | ((F.col("kind") == "audio") & (F.col("_ext") == "wav"))
            | ((F.col("kind") == "video") & (F.col("_ext") == "avi"))
        )
        base = media.select("media_id", "kind", "path", "n_bytes", "_ext")
        img = image_pixel_features(media.filter(decodable)).join(
            base, "media_id"
        ).select(
            "media_id", "kind", "path", "n_bytes",
            "width", "height", "mean_b", "mean_g", "mean_r",
            null_i.alias("sample_rate"), null_l.alias("n_samples"),
            null_d.alias("rms"), null_i.alias("peak"),
            null_l.alias("n_frames"), null_s.alias("decode_note"),
        )
        aud = audio_features(media.filter(decodable)).join(
            base, "media_id"
        ).select(
            "media_id", "kind", "path", "n_bytes",
            null_i.alias("width"), null_i.alias("height"),
            null_d.alias("mean_b"), null_d.alias("mean_g"),
            null_d.alias("mean_r"),
            "sample_rate", "n_samples", "rms", "peak",
            null_l.alias("n_frames"), null_s.alias("decode_note"),
        )
        vid = video_summary_features(media.filter(decodable)).join(
            base, "media_id"
        ).select(
            "media_id", "kind", "path", "n_bytes",
            "width", "height", "mean_b", "mean_g", "mean_r",
            null_i.alias("sample_rate"), null_l.alias("n_samples"),
            null_d.alias("rms"), null_i.alias("peak"),
            "n_frames", null_s.alias("decode_note"),
        )
        other = base.filter(~decodable).select(
            "media_id", "kind", "path", "n_bytes",
            null_i.alias("width"), null_i.alias("height"),
            null_d.alias("mean_b"), null_d.alias("mean_g"),
            null_d.alias("mean_r"),
            null_i.alias("sample_rate"), null_l.alias("n_samples"),
            null_d.alias("rms"), null_i.alias("peak"),
            null_l.alias("n_frames"),
            F.when(
                F.col("kind").isin("image", "audio", "video"),
                F.lit("undecodable_format"),
            ).alias("decode_note"),
        )
        (
            img.unionByName(aud).unionByName(vid).unionByName(other)
            .withColumn("_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch")
            .parquet(output_dir)
        )

    q = (
        stream.writeStream.foreachBatch(_body)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def ann_probe_stream(
    spark: SparkSession,
    input_dir: str,
    artifact_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    nprobe: int = 4,
    k: int = 5,
    max_files_per_trigger: int | None = None,
) -> None:
    """SERVE approximate top-k from a frozen IVF-PQ artifact over a
    streaming query drop zone — the serving complement of
    :func:`ann_index_ingest_stream`'s maintenance path: parquet-shaped
    batches of ``(vec_id, embedding)`` query vectors arrive in a growing
    directory; each drain probes the artifact at probe-only cost (the
    raw corpus is never touched; the frozen quantizers memoize across
    drains via the artifact's single-slot cache) and lands
    ``(query_id, neighbor_id, rank, dist, _batch)`` as a
    ``_batch``-partitioned dynamic partition overwrite, so an
    at-least-once foreachBatch replay rewrites its own partition instead
    of double-appending — the same replay contract as the ingest path.
    Probes and index maintenance compose: a drain that lands between
    ingest drains sees base ∪ delta exactly like a batch probe would.
    Scheduling caveat (the artifact family's standing discipline): a
    probe drain that races an in-flight fold (compact's meta tombstone
    window) FAILS LOUDLY and replays on restart — run probe and
    maintenance streams under one scheduler slot, or accept the retry.
    Under that one-slot discipline a tombstone + recovery-sidecar state
    at drain start can only be a CRASHED fold, so the drain body resumes
    it (``similarity.resume_crashed_compact``) instead of wedging the
    serving stream permanently on the torn-state refusal.

    Output ownership: ``_batch`` partition numbers come from THIS
    checkpoint's batch counter, so the output dir is meaningful only
    relative to one checkpoint. The stream therefore stamps
    ``{output_dir}/_probe_owner`` with its checkpoint path on first use
    and REFUSES an output dir that already holds ``_batch=*`` partitions
    owned by a different checkpoint (two serving streams would silently
    cross-overwrite each other's partitions) or written under a
    checkpoint that has since been reset (the fresh counter restarts at
    0, so partitions the new run never rewrites would linger as stale
    duplicates for any consumer unioning the directory)."""
    from ..operators.similarity import (
        ivf_pq_meta,
        ivf_pq_topk_frozen,
        resume_crashed_compact,
    )

    _claim_stream_output(spark, output_dir, checkpoint_dir, "_probe_owner")

    def _body(batch, batch_id: int) -> None:
        if not batch.take(1):
            return
        meta = ivf_pq_meta(spark, artifact_dir)
        if meta is None or int(meta["nlist"]) < 0:
            # crashed auto-compact (tombstone + sidecar): self-heal; a
            # tombstone with nothing to resume still refuses loudly below
            resume_crashed_compact(spark, artifact_dir)
        (
            ivf_pq_topk_frozen(batch, artifact_dir, nprobe=nprobe, k=k)
            .withColumn("_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch")
            .parquet(output_dir)
        )

    schema = "vec_id long, embedding array<double>"
    reader = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.load(input_dir)
        .writeStream.foreachBatch(_body)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

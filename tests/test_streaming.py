"""Structured Streaming extension: bounded (availableNow) run must agree
with the equivalent batch aggregation."""

from __future__ import annotations

from learn_hbase_spark.streaming.events import (
    read_event_stream,
    run_bounded,
    session_window_counts,
    windowed_event_counts,
)
from learn_hbase_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_windowed_counts_match_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    # re-materialize events with µs timestamps so the stream reader's schema
    # (EVENTS, TimestampType) matches the files
    load_table(spark, SF, "events").write.parquet(src)

    stream = read_event_stream(spark, src)
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_bounded(agg, out_dir, ckpt)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.read.parquet(out_dir).collect()
    }

    from pyspark.sql import functions as F

    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .select(
            F.col("window.start").alias("ws"),
            F.col("window.end").alias("we"),
            "event_type", "n", "s",
        )
    )
    rows = batch.collect()
    want = {(r["ws"], r["event_type"]): (r["n"], round(r["s"], 6)) for r in rows}
    # append mode emits a window only once the watermark (max_ts - 2h)
    # passes its end — the trailing windows legitimately stay open
    max_ts = load_table(spark, SF, "events").agg(F.max("ts")).first()[0]
    import datetime as dt

    closed = {
        (r["ws"], r["event_type"]): (r["n"], round(r["s"], 6))
        for r in rows
        if r["we"] <= max_ts - dt.timedelta(hours=2)
    }
    assert got, "stream produced no finalized windows"
    for k, v in got.items():
        assert want[k] == v, f"window {k}: stream {v} != batch {want[k]}"
    missing = set(closed) - set(got)
    assert not missing, f"closed windows not emitted: {sorted(missing)[:5]}"


def test_session_windows_match_batch(spark, tmp_path):
    """Streaming gap-sessions must agree with the identical batch
    session_window aggregation for every session the watermark closed."""
    import datetime as dt

    src = str(tmp_path / "src")
    load_table(spark, SF, "events").write.parquet(src)

    stream = read_event_stream(spark, src)
    agg = session_window_counts(stream, gap="30 minutes", watermark="2 hours")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_bounded(agg, out_dir, ckpt)
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.read.parquet(out_dir).collect()
    }

    batch = session_window_counts(load_table(spark, SF, "events"),
                                  gap="30 minutes", watermark="2 hours")
    rows = batch.collect()
    want = {
        (r["user_id"], r["session_start"]): (r["n_events"], round(r["sum_value"], 6))
        for r in rows
    }
    max_ts = load_table(spark, SF, "events").selectExpr("max(ts)").first()[0]
    closed = {
        k: v
        for k, v, end in (
            ((r["user_id"], r["session_start"]),
             (r["n_events"], round(r["sum_value"], 6)),
             r["session_end"])
            for r in rows
        )
        if end <= max_ts - dt.timedelta(hours=2)
    }
    assert got, "stream produced no finalized sessions"
    for k, v in got.items():
        assert want[k] == v, f"session {k}: stream {v} != batch {want[k]}"
    missing = set(closed) - set(got)
    assert not missing, f"closed sessions not emitted: {sorted(missing)[:5]}"


def test_session_windows_under_rocksdb_state_store(spark, tmp_path):
    """The same stateful query must produce identical results under the
    spillable RocksDB state store provider (the 100 TB posture — state off
    the heap) as under the default in-heap provider, and the RocksDB run
    must actually materialize RocksDB state files in its checkpoint."""
    from learn_hbase_spark.streaming.events import use_rocksdb_state_store

    src = str(tmp_path / "src")
    load_table(spark, SF, "events").write.parquet(src)

    def run(tag):
        out, ckpt = str(tmp_path / f"out_{tag}"), str(tmp_path / f"ck_{tag}")
        agg = session_window_counts(
            read_event_stream(spark, src), gap="30 minutes", watermark="2 hours"
        )
        run_bounded(agg, out, ckpt)
        return (
            {
                (r["user_id"], r["session_start"]): (
                    r["n_events"],
                    round(r["sum_value"], 6),
                )
                for r in spark.read.parquet(out).collect()
            },
            ckpt,
        )

    default_res, _ = run("heap")
    use_rocksdb_state_store(spark)
    try:
        rocks_res, rocks_ckpt = run("rocks")
    finally:
        use_rocksdb_state_store(spark, enable=False)

    assert rocks_res == default_res and rocks_res
    # RocksDB leaves its own artifacts (.zip snapshots / .changelog) in the
    # state dir — proof the provider was actually in effect, not silently
    # defaulted
    import glob

    state_files = glob.glob(f"{rocks_ckpt}/state/**/*", recursive=True)
    assert any(f.endswith((".zip", ".changelog")) for f in state_files), (
        state_files[:10]
    )


def test_stateful_user_totals_match_batch(spark, tmp_path):
    """applyInPandasWithState running totals: after draining the bounded
    stream, the latest state per user equals the batch groupBy."""
    from pyspark.sql import functions as F

    from learn_hbase_spark.streaming.events import stateful_user_totals

    src = str(tmp_path / "src")
    load_table(spark, SF, "events").write.parquet(src)

    stream = read_event_stream(spark, src)
    out = stateful_user_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_totals")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # update mode may emit a user several times (once per micro-batch);
    # the final emission carries the complete totals
    got_df = spark.sql("SELECT * FROM stateful_totals")
    got = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 6))
        for r in got_df.orderBy("n_events").collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum(F.coalesce("value", F.lit(0.0))).alias("s"))
        .collect()
    }
    assert set(got) == set(want)
    for u, v in want.items():
        assert got[u] == v, f"user {u}: stream {got[u]} != batch {v}"


def test_stream_upsert_into_widetable_is_idempotent(spark, tmp_path):
    """foreachBatch upsert: the drained stream's WideTable contents equal
    the batch-derived cells, and replaying the whole stream (fresh
    checkpoint — the reference's 'rerun the day' recovery) changes
    nothing thanks to latest-wins resolution."""
    from learn_hbase_spark.streaming.events import (
        event_day_cells,
        upsert_stream_to_widetable,
    )
    from learn_hbase_spark.widetable import WideTable

    src = str(tmp_path / "src")
    ev = load_table(spark, SF, "events")
    ev.write.parquet(src)
    table = WideTable.create(spark, str(tmp_path / "wt"), ["bmz"])

    upsert_stream_to_widetable(
        read_event_stream(spark, src), table, str(tmp_path / "ckpt1")
    )
    want = {
        (r["rowkey"], r["qualifier"]): r["value"]
        for r in event_day_cells(ev).collect()
    }
    got = {
        (r["rowkey"], r["qualifier"]): r["value"]
        for r in table.scan(families=["bmz"]).collect()
    }
    assert got == want and len(got) > 0

    # replay with a fresh checkpoint: same cells, newer versions, same reads
    upsert_stream_to_widetable(
        read_event_stream(spark, src), table, str(tmp_path / "ckpt2")
    )
    again = {
        (r["rowkey"], r["qualifier"]): r["value"]
        for r in table.scan(families=["bmz"]).collect()
    }
    assert again == want


def test_stream_dedup_first_wins(spark, tmp_path):
    """Streaming dropDuplicates with watermark: duplicated keys across the
    bounded run collapse to one row each."""
    from learn_hbase_spark.streaming.events import dedup_stream

    src = str(tmp_path / "src")
    ev = load_table(spark, SF, "events")
    # duplicate the whole table to force cross-file duplicates
    ev.union(ev).write.parquet(src)

    stream = read_event_stream(spark, src)
    deduped = dedup_stream(stream, keys=["event_id"], watermark="2 hours")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_bounded(deduped, out_dir, ckpt)

    got = spark.read.parquet(out_dir)
    n_unique = ev.select("event_id").distinct().count()
    assert got.count() == n_unique
    assert got.select("event_id").distinct().count() == n_unique


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Watermarked click->purchase stream-stream join must agree with the
    identical batch join for every pair the watermark could finalize."""
    from pyspark.sql import functions as F

    from learn_hbase_spark.streaming.events import click_purchase_stream_join

    src = str(tmp_path / "src")
    load_table(spark, SF, "events").write.parquet(src)

    def sides(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    stream = read_event_stream(spark, src)
    joined = click_purchase_stream_join(*sides(stream))
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_bounded(joined, out_dir, ckpt)
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.read.parquet(out_dir).collect()
    }

    batch = load_table(spark, SF, "events")
    want_df = click_purchase_stream_join(*sides(batch))
    want = {(r["click_id"], r["purchase_id"]) for r in want_df.collect()}

    # streaming may legitimately hold back pairs the watermark never closed;
    # everything it DID emit must be correct, and emitted pairs must cover
    # all pairs whose inputs are older than the watermark horizon
    assert got <= want
    max_ts = batch.agg(F.max("ts")).first()[0]
    import datetime as dt

    horizon = max_ts - dt.timedelta(hours=3)  # watermark 2h + gap 1h
    closed = {
        (r["click_id"], r["purchase_id"])
        for r in want_df.filter(
            (F.col("click_ts") < F.lit(horizon))
            & (F.col("purchase_ts") < F.lit(horizon))
        ).collect()
    }
    assert closed <= got, f"missing closed pairs: {sorted(closed - got)[:5]}"
    assert got, "stream join emitted nothing"


def test_stream_static_enrichment(spark, tmp_path):
    """Stream-static join: every emitted row carries its dim attribute;
    rows without a dim match survive with null (left join)."""
    from pyspark.sql import functions as F

    from learn_hbase_spark.streaming.events import enrich_stream_with_dim

    src = str(tmp_path / "src")
    load_table(spark, SF, "events").write.parquet(src)
    dim = (
        load_table(spark, SF, "events")
        .select("user_id").distinct()
        .filter(F.col("user_id") % 2 == 0)
        .withColumn("segment", F.lit("even"))
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_bounded(
        enrich_stream_with_dim(read_event_stream(spark, src), dim),
        out_dir, ckpt,
    )
    got = spark.read.parquet(out_dir)
    assert got.count() == load_table(spark, SF, "events").count()
    assert got.filter(
        (F.col("user_id") % 2 == 0) & (F.col("segment") != "even")
    ).count() == 0
    assert got.filter(
        (F.col("user_id") % 2 == 1) & F.col("segment").isNotNull()
    ).count() == 0


def test_dedup_within_watermark_catches_retimed_duplicates(spark, tmp_path):
    """A duplicate event_id retransmitted with a LATER timestamp must still
    dedup (the case dropDuplicates on (id, ts) cannot catch)."""
    import datetime as dt

    from learn_hbase_spark.schemas import EVENTS
    from learn_hbase_spark.streaming.events import dedup_stream_within_watermark

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [  # (event_id, ts, user_id, event_type, value, props)
        (1, base, 100, "click", 1.0, "{}"),
        (1, base + dt.timedelta(minutes=5), 100, "click", 1.0, "{}"),  # retimed dup
        (2, base + dt.timedelta(minutes=1), 100, "view", 2.0, "{}"),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [
            dict(zip([f.name for f in EVENTS.fields], r))
            for r in rows
        ],
        EVENTS,
    ).write.parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_bounded(
        dedup_stream_within_watermark(
            read_event_stream(spark, src), ["event_id"], watermark="1 hour"
        ),
        out_dir, ckpt,
    )
    got = spark.read.parquet(out_dir)
    assert got.count() == 2
    assert got.filter("event_id = 1").count() == 1


def test_stateful_sessions_with_timeout_match_session_windows(spark, tmp_path):
    """The timer-driven custom session operator must agree with the
    engine's session_window aggregation for every session it emitted
    (emission requires the watermark to pass session_end + gap)."""
    from pyspark.sql import functions as F

    from learn_hbase_spark.streaming.events import (
        stateful_sessions_with_timeout,
    )

    src = str(tmp_path / "src")
    load_table(spark, SF, "events").write.parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_bounded(
        stateful_sessions_with_timeout(
            read_event_stream(spark, src), gap_seconds=1800
        ),
        out_dir, ckpt,
    )
    got = {
        (r["user_id"], r["session_start"]): (
            r["session_end"], r["n_events"], round(r["sum_value"], 6)
        )
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got, "no sessions expired within the bounded run"

    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .select(
            "user_id",
            F.col("session_window.start").alias("ws"),
            "n", "s",
        )
    )
    want = {
        (r["user_id"], r["ws"]): (r["n"], round(r["s"], 6))
        for r in batch.collect()
    }
    for (uid, start), (end, n, s) in got.items():
        assert want[(uid, start)] == (n, s), (
            f"user {uid} session {start}: custom {(n, s)} != "
            f"engine {want[(uid, start)]}"
        )


def test_stream_resume_processes_only_new_files(spark, tmp_path):
    """Checkpoint resume is the incremental-ingest contract: after a
    bounded run drains batch 1, a second run against the SAME checkpoint
    must process ONLY files that arrived in between — no reprocessing
    (the source offset log), no misses. This is what replaces the
    reference's manual day-loop bookkeeping (RdlETL.java day iteration):
    the checkpoint IS the watermark of what's been ingested."""
    from pyspark.sql import functions as F

    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)

    src = str(tmp_path / "src")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    first.write.parquet(src)

    stream_schema = "event_id long, user_id long, value double"

    def drain():
        s = spark.readStream.schema(stream_schema).parquet(src)
        q = (
            s.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    n1 = spark.read.parquet(out).count()
    assert n1 == first.count()

    # batch 2 lands as NEW files in the same directory
    second.write.mode("append").parquet(src)
    drain()
    got = spark.read.parquet(out)
    assert got.count() == ev.count()  # nothing reprocessed, nothing missed
    assert got.select("event_id").distinct().count() == ev.count()


def test_widetable_lsm_is_a_change_stream(spark, tmp_path):
    """The LSM layout makes the WideTable directory ITSELF a streaming
    source: every put() lands as new parquet files, so readStream over
    the table path + a checkpoint delivers each write batch exactly once
    — the changes() batch feed, as a live stream, with no extra
    infrastructure. The descriptor file (underscore-prefixed) is
    invisible to the stream reader like any other parquet scan."""
    from pyspark.sql import functions as F

    from learn_hbase_spark.widetable import STORED_SCHEMA, WideTable

    t = WideTable.create(spark, str(tmp_path / "t"), ["info"])
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        s = (
            spark.readStream.schema(STORED_SCHEMA)
            .parquet(t.path)
            .withColumn(
                "op",
                F.when(F.col("value").isNull(), F.lit("delete")).otherwise(
                    F.lit("put")
                ),
            )
        )
        q = (
            s.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    t.put(
        spark.createDataFrame(
            [("0401_A", "info", "q", "v1")],
            "rowkey string, family string, qualifier string, value string",
        )
    )
    drain()
    assert spark.read.parquet(out).count() == 1

    t.put(
        spark.createDataFrame(
            [("0402_B", "info", "q", "v2")],
            "rowkey string, family string, qualifier string, value string",
        )
    )
    t.delete("0401_A", "info", "q")
    drain()
    got = spark.read.parquet(out)
    # each write batch delivered exactly once, tombstone typed as delete
    assert got.count() == 3
    ops = {(r["rowkey"], r["op"]) for r in got.collect()}
    assert ("0401_A", "delete") in ops and ("0402_B", "put") in ops


def test_streaming_neardup_ingest_gates_duplicates(spark, tmp_path):
    """Streaming LSH-gated ingest: batch 2's duplicate-of-history doc is
    rejected via the persisted band index, its intra-batch duplicate is
    rejected by min-id, and genuinely new docs append. Re-draining with
    the same checkpoint processes nothing new (idempotent)."""
    import json

    from learn_hbase_spark.streaming.events import neardup_ingest_stream

    inp = tmp_path / "in"
    inp.mkdir()
    idx = str(tmp_path / "index")
    acc = str(tmp_path / "accepted")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, rows):
        with open(inp / name, "w") as fh:
            for doc_id, text in rows:
                fh.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    write_batch("b1.json", [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "totally different words in this second document here"),
    ])
    neardup_ingest_stream(spark, str(inp), idx, acc, ckpt)
    got1 = {r["doc_id"] for r in spark.read.parquet(acc).collect()}
    assert got1 == {1, 2}

    write_batch("b2.json", [
        (3, "alpha beta gamma delta epsilon zeta eta theta"),  # hist dup of 1
        (4, "brand new unique content appearing only in batch two"),
        (5, "brand new unique content appearing only in batch two"),  # intra dup of 4
    ])
    neardup_ingest_stream(spark, str(inp), idx, acc, ckpt)
    got2 = {r["doc_id"] for r in spark.read.parquet(acc).collect()}
    assert got2 == {1, 2, 4}

    # draining again with nothing new must be a no-op
    neardup_ingest_stream(spark, str(inp), idx, acc, ckpt)
    got3 = [r["doc_id"] for r in spark.read.parquet(acc).collect()]
    assert sorted(got3) == [1, 2, 4]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_neardup_ingest_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a batch replayed after its writes
    landed but before the checkpoint committed must NOT duplicate rows in
    either output — the writes are dynamic partition overwrites of the
    batch's own _batch partition (VERDICT r5 #1)."""
    from learn_hbase_spark.streaming.events import neardup_ingest_batch

    idx, acc = str(tmp_path / "index"), str(tmp_path / "accepted")
    b1 = _docs(spark, [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "totally different words in this second document here"),
    ])
    b2 = _docs(spark, [
        (3, "alpha beta gamma delta epsilon zeta eta theta"),  # hist dup of 1
        (4, "brand new unique content appearing only in batch two"),
    ])
    neardup_ingest_batch(b1, 0, idx, acc)
    neardup_ingest_batch(b2, 1, idx, acc)
    before_acc = sorted(r["doc_id"] for r in spark.read.parquet(acc).collect())
    before_idx = sorted(
        (r["_id"], r["_bk"]) for r in spark.read.parquet(idx).collect()
    )
    assert before_acc == [1, 2, 4]

    # simulated post-write / pre-checkpoint failure: the SAME batch replays
    neardup_ingest_batch(b2, 1, idx, acc)
    after_acc = sorted(r["doc_id"] for r in spark.read.parquet(acc).collect())
    after_idx = sorted(
        (r["_id"], r["_bk"]) for r in spark.read.parquet(idx).collect()
    )
    assert after_acc == before_acc  # no duplicate accepted documents
    assert after_idx == before_idx  # no duplicate index bands
    # and the other batches' partitions were untouched by the overwrite
    assert 1 in after_acc and 2 in after_acc


def test_widetable_upsert_batch_replay_is_idempotent(spark, tmp_path):
    """The other foreachBatch sink: WideTable.put is latest-wins, so a
    replayed batch lands identical cells with a newer version and the read
    resolves to the same table state."""
    from pyspark.sql import functions as F

    from learn_hbase_spark.streaming.events import upsert_batch
    from learn_hbase_spark.widetable import WideTable

    t = WideTable.create(spark, str(tmp_path / "t"), ["bmz"])
    ev = spark.createDataFrame(
        [(7, "2019-05-01 10:00:00", 3.5), (7, "2019-05-01 11:00:00", 4.5)],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    from learn_hbase_spark.streaming.events import event_day_cells

    upsert_batch(t, ev, 0, event_day_cells)
    before = sorted(
        (r["rowkey"], r["qualifier"], r["value"])
        for r in t.scan().collect()
    )
    upsert_batch(t, ev, 0, event_day_cells)  # replay, same batch
    after = sorted(
        (r["rowkey"], r["qualifier"], r["value"])
        for r in t.scan().collect()
    )
    assert after == before == [("00000007", "20190501", "4.5")]


def test_neardup_ingest_corrupted_index_fails_loudly(spark, tmp_path):
    """A corrupted band index must fail the batch, not be treated as 'no
    index yet' (which would silently admit near-duplicates) — VERDICT r5
    #2: the existence probe replaced the bare except around the read."""
    import pytest

    from learn_hbase_spark.streaming.events import neardup_ingest_batch

    idx, acc = str(tmp_path / "index"), str(tmp_path / "accepted")
    b1 = _docs(spark, [(1, "alpha beta gamma delta epsilon zeta eta theta")])
    neardup_ingest_batch(b1, 0, idx, acc)
    # truncate every parquet file in the index: bad footers
    import pathlib

    for p in pathlib.Path(idx).rglob("*.parquet"):
        p.write_bytes(p.read_bytes()[: max(1, p.stat().st_size // 3)])
    b2 = _docs(spark, [(2, "some fresh words never before seen here now")])
    with pytest.raises(Exception, match="(?i)parquet|footer|corrupt"):
        neardup_ingest_batch(b2, 1, idx, acc)


def test_neardup_ingest_restart_after_lost_commit_is_exactly_once(
    spark, tmp_path
):
    """End-to-end replay through Structured Streaming's OWN recovery path
    (VERDICT r6 #7; the direct batch-body replay tests above simulate the
    failure, this one drives it): a crash between the foreachBatch writes
    and the checkpoint commit is simulated by deleting the latest commit
    file after a successful drain. On restart the engine sees the offset
    without its commit, replays that exact batch through foreachBatch, and
    the _batch-partitioned dynamic partition overwrites must keep BOTH
    outputs exactly-once."""
    import json
    import os

    from learn_hbase_spark.streaming.events import neardup_ingest_stream

    inp = tmp_path / "in"
    inp.mkdir()
    idx = str(tmp_path / "index")
    acc = str(tmp_path / "accepted")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, rows):
        with open(inp / name, "w") as fh:
            for doc_id, text in rows:
                fh.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    write_batch("b1.json", [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "totally different words in this second document here"),
    ])
    neardup_ingest_stream(spark, str(inp), idx, acc, ckpt)
    write_batch("b2.json", [
        (3, "alpha beta gamma delta epsilon zeta eta theta"),  # hist dup of 1
        (4, "brand new unique content appearing only in batch two"),
        (5, "brand new unique content appearing only in batch two"),  # intra
    ])
    neardup_ingest_stream(spark, str(inp), idx, acc, ckpt)
    before_acc = sorted(r["doc_id"] for r in spark.read.parquet(acc).collect())
    before_idx = sorted(
        (r["_id"], r["_bk"]) for r in spark.read.parquet(idx).collect()
    )
    assert before_acc == [1, 2, 4]

    # crash between write and commit: the engine wrote offsets/N, ran the
    # batch (outputs landed), but never recorded commits/N
    commits = [
        c for c in os.listdir(os.path.join(ckpt, "commits"))
        if not c.startswith(".")
    ]
    latest = max(int(c) for c in commits)
    os.remove(os.path.join(ckpt, "commits", str(latest)))
    crc = os.path.join(ckpt, "commits", f".{latest}.crc")
    if os.path.exists(crc):  # local-FS checksum shadow of the commit file
        os.remove(crc)

    # restart: recovery replays batch `latest` from its offset log entry
    neardup_ingest_stream(spark, str(inp), idx, acc, ckpt)
    after_acc = sorted(r["doc_id"] for r in spark.read.parquet(acc).collect())
    after_idx = sorted(
        (r["_id"], r["_bk"]) for r in spark.read.parquet(idx).collect()
    )
    assert after_acc == before_acc
    assert after_idx == before_idx
    # and the replayed batch's commit is restored
    assert str(latest) in os.listdir(os.path.join(ckpt, "commits"))


def test_neardup_file_stream_ingests_only_new_files(spark, tmp_path):
    """The crawl-drop-zone shape: text files land in a growing directory;
    each drain ingests ONLY the files the checkpoint hasn't seen, gates
    them against the persisted band index (near-dup of an earlier FILE is
    rejected), prunes non-matching names at the listing, and keeps ids
    stable (md5 of path, matching the batch file edge)."""
    from learn_hbase_spark.streaming.events import neardup_ingest_file_stream

    inp = tmp_path / "drop"
    inp.mkdir()
    idx = str(tmp_path / "index")
    acc = str(tmp_path / "accepted")
    ckpt = str(tmp_path / "ckpt")

    (inp / "a.txt").write_text(
        "alpha beta gamma delta epsilon zeta eta theta")
    (inp / "b.txt").write_text(
        "totally different words in this second document here")
    (inp / "ignore.log").write_text("not part of the corpus")

    kw = dict(pattern="*.txt", max_files_per_trigger=1)
    neardup_ingest_file_stream(spark, str(inp), idx, acc, ckpt, **kw)
    rows1 = {r["path"].rsplit("/", 1)[-1]: r
             for r in spark.read.parquet(acc).collect()}
    assert set(rows1) == {"a.txt", "b.txt"}  # .log pruned at the listing
    # maxFilesPerTrigger=1 -> one micro-batch (and _batch partition) each
    assert rows1["a.txt"]["_batch"] != rows1["b.txt"]["_batch"]
    import re
    assert all(re.fullmatch(r"[0-9a-f]{32}", r["doc_id"])
               for r in rows1.values())

    # second drop: near-identical content of a.txt (normalize-equal) must
    # be rejected via the PERSISTED index; the genuinely new file lands
    (inp / "c.txt").write_text(
        "Alpha  BETA gamma delta epsilon zeta eta theta")
    (inp / "d.txt").write_text(
        "brand new unique content appearing only in drop two")
    neardup_ingest_file_stream(spark, str(inp), idx, acc, ckpt, **kw)
    rows2 = {r["path"].rsplit("/", 1)[-1]: r
             for r in spark.read.parquet(acc).collect()}
    assert set(rows2) == {"a.txt", "b.txt", "d.txt"}
    # earlier files kept their ids (stable md5(path) across drains)
    for name in ("a.txt", "b.txt"):
        assert rows2[name]["doc_id"] == rows1[name]["doc_id"]

    # third drain with nothing new is a no-op (checkpointed file listing)
    neardup_ingest_file_stream(spark, str(inp), idx, acc, ckpt, **kw)
    assert {r["path"].rsplit("/", 1)[-1]
            for r in spark.read.parquet(acc).collect()} == {
        "a.txt", "b.txt", "d.txt"}


def test_curation_file_stream_curates_incrementally(spark, tmp_path):
    """The CCNet loop at the streaming edge: each drain of the drop zone
    runs quality gate -> LSH near-dup gate vs the persisted index ->
    batch-local LM band; the checkpoint makes the second drain process
    only new files; and the band index records LM-DROPPED non-duplicates
    so their later near-dups are rejected as duplicates, not re-curated."""
    from learn_hbase_spark.streaming.events import curation_ingest_file_stream

    inp = tmp_path / "drop"
    inp.mkdir()
    idx = str(tmp_path / "index")
    cur = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")

    # self-repetitive docs score HIGH under the batch-trained bigram LM
    # (their own bigrams dominate the counts); disjoint vocabularies keep
    # them out of each other's LSH buckets
    (inp / "a.txt").write_text("one two " * 5)
    (inp / "b.txt").write_text("red blue " * 5)
    # unique-token soup: every bigram seen once -> lowest LM score
    (inp / "c.txt").write_text("zq wx kv jn pm yt rb lc df gh")
    (inp / "short.txt").write_text("tiny doc")

    kw = dict(pattern="*.txt", min_tokens=5, lm_quantile=0.3)
    curation_ingest_file_stream(spark, str(inp), idx, cur, ckpt, **kw)

    names = lambda d: {  # noqa: E731
        r["path"].rsplit("/", 1)[-1] for r in spark.read.parquet(d).collect()
    }
    assert names(cur) == {"a.txt", "b.txt"}  # c low-quality, short gated
    # the index holds every quality-gated NON-DUPLICATE, incl. LM-dropped c
    idx_rows = spark.read.parquet(idx)
    n_docs_indexed = idx_rows.select("_id").distinct().count()
    assert n_docs_indexed == 3

    # drop 2: near-dup of the LM-dropped c must be rejected as DUPLICATE
    # (content identity outlives the quality verdict); d is fresh and good
    (inp / "c2.txt").write_text("ZQ  wx kv jn pm yt rb lc df gh")
    (inp / "d.txt").write_text("lime teal " * 5)
    curation_ingest_file_stream(spark, str(inp), idx, cur, ckpt, **kw)
    assert names(cur) == {"a.txt", "b.txt", "d.txt"}
    assert spark.read.parquet(idx).select("_id").distinct().count() == 4

    # third drain with nothing new: checkpointed listing -> no-op
    curation_ingest_file_stream(spark, str(inp), idx, cur, ckpt, **kw)
    assert names(cur) == {"a.txt", "b.txt", "d.txt"}


def test_stream_upsert_into_subpartitioned_widetable(spark, tmp_path):
    """VERDICT r9 #6: the r8 foreachBatch upsert and the r8/r9 two-level
    (prefix, bucket) layout COMPOSE — drain the event stream into a
    bucketed WideTable, replay with a fresh checkpoint (the reference's
    'rerun the day' recovery: latest-wins keeps reads identical), then
    compact one (prefix, bucket) cell and verify the resolved view and
    point-get pruning still hold."""
    from pyspark.sql import functions as F

    from learn_hbase_spark.streaming.events import (
        event_day_cells,
        upsert_stream_to_widetable,
    )
    from learn_hbase_spark.widetable import WideTable

    src = str(tmp_path / "src")
    ev = load_table(spark, SF, "events")
    ev.write.parquet(src)
    table = WideTable.create(
        spark, str(tmp_path / "wt"), ["bmz"], n_subpartitions=4
    )

    upsert_stream_to_widetable(
        read_event_stream(spark, src), table, str(tmp_path / "ckpt1")
    )
    want = {
        (r["rowkey"], r["qualifier"]): r["value"]
        for r in event_day_cells(ev).collect()
    }
    got = {
        (r["rowkey"], r["qualifier"]): r["value"]
        for r in table.scan(families=["bmz"]).collect()
    }
    assert got == want and len(got) > 0
    # rows really landed across multiple buckets of the two-level layout
    buckets = {r["bucket"] for r in table._cells().select("bucket").collect()}
    assert len(buckets) > 1

    # restart/replay with a fresh checkpoint: newer versions, same reads
    upsert_stream_to_widetable(
        read_event_stream(spark, src), table, str(tmp_path / "ckpt2")
    )
    again = {
        (r["rowkey"], r["qualifier"]): r["value"]
        for r in table.scan(families=["bmz"]).collect()
    }
    assert again == want

    # per-bucket compaction of the replay debt: pick the hottest
    # (prefix, bucket) cell, compact ONLY it, reads unchanged, its
    # version debt collapsed while a sibling bucket keeps 2 versions
    cells = (
        table._cells()
        .groupBy("prefix", "bucket")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "prefix", "bucket")
        .collect()
    )
    hot_prefix, hot_bucket = cells[0]["prefix"], cells[0]["bucket"]
    table.compact_prefixes([hot_prefix], buckets=[hot_bucket])
    after = {
        (r["rowkey"], r["qualifier"]): r["value"]
        for r in table.scan(families=["bmz"]).collect()
    }
    assert after == want
    vers = {
        (r["prefix"], r["bucket"]): r["nv"]
        for r in table._cells()
        .groupBy("prefix", "bucket")
        .agg(F.countDistinct("version").alias("nv"))
        .collect()
    }
    assert vers[(hot_prefix, hot_bucket)] == 1
    assert max(vers.values()) > 1  # siblings keep their replay versions
    # point get on the compacted bucket still resolves (and prunes to one
    # sub-directory via the driver-side md5 bucket literal)
    some_key = next(
        r["rowkey"]
        for r in table._cells()
        .filter(
            (F.col("prefix") == hot_prefix) & (F.col("bucket") == hot_bucket)
        )
        .select("rowkey")
        .limit(1)
        .collect()
    )
    day, val = next((q, v) for (k, q), v in want.items() if k == some_key)
    assert (
        table.get(some_key, "bmz", day).collect()[0]["value"] == val
    )


def test_curation_file_stream_gopher_gate(spark, tmp_path):
    """The optional Gopher rule gate at the streaming edge: a doc failing
    the rules (no stopwords) is dropped BEFORE the dedup index — rule
    failure is a deterministic content property, so it never needs a
    content-identity record — while rule-passing docs land as before."""
    from learn_hbase_spark.streaming.events import curation_ingest_file_stream

    inp = tmp_path / "drop"
    inp.mkdir()
    idx = str(tmp_path / "index")
    cur = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")

    good = "the " + " ".join(f"g{j}w" for j in range(11))  # stopword 'the'
    no_stop = " ".join(f"q{j}z" for j in range(12))        # zero stopwords
    (inp / "good.txt").write_text(good)
    (inp / "nostop.txt").write_text(no_stop)
    (inp / "short.txt").write_text("tiny doc")

    curation_ingest_file_stream(
        spark, str(inp), idx, cur, ckpt, pattern="*.txt", min_tokens=5,
        gopher_quality=True,
        gopher_quality_kwargs={"min_words": 8, "min_stopwords": 1},
    )
    names = {r["path"].rsplit("/", 1)[-1]
             for r in spark.read.parquet(cur).collect()}
    assert names == {"good.txt"}
    # only the rule-passing doc reached the index
    assert spark.read.parquet(idx).select("_id").distinct().count() == 1


def test_curation_file_stream_frozen_lm_band(spark, tmp_path):
    """VERDICT r10 #4: the FROZEN-model LM band at the streaming edge. A
    micro-batch cannot train the model that judges it (batch-local
    thresholds drift per drain), so the deployment shape freezes the
    model offline (freeze_bigram_lm) and every drain scores against the
    materialized tables under a frozen absolute cutoff — making the LM
    verdict a deterministic content property: rejects drop BEFORE the
    dedup index (like Gopher rejects), a future copy re-fails on
    content, and a fresh-checkpoint full replay reproduces the exact
    curated set regardless of how files re-batch."""
    from learn_hbase_spark.operators.corpus import (
        bigram_lm_score_frozen,
        bigram_lm_score_tables,
        freeze_bigram_lm,
        load_bigram_lm,
    )
    from learn_hbase_spark.streaming.events import curation_ingest_file_stream

    model = spark.createDataFrame(
        [
            (1, "alpha beta " * 8),
            (2, "alpha beta " * 8),
            (3, "gamma delta " * 8),
            (4, "gamma delta " * 8),
            (5, " ".join(f"m{j}x" for j in range(10))),  # low self-score
        ],
        "doc_id long, text string",
    )
    mdir = str(tmp_path / "lm_model")
    thr = freeze_bigram_lm(model, mdir, threshold_quantile=0.1)
    assert isinstance(thr, float)

    # materialization round-trip is lossless: scoring through the loaded
    # tables == scoring through the inline frozen-model operator
    probe = spark.createDataFrame(
        [(10, "alpha beta gamma"), (11, "zz qq ww rr tt")],
        "doc_id long, text string",
    )
    c2, c1, v, k, thr2 = load_bigram_lm(spark, mdir)
    assert thr2 == thr
    via_tables = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in bigram_lm_score_tables(probe, c2, c1, v, k=k).collect()
    }
    via_frame = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in bigram_lm_score_frozen(probe, model).collect()
    }
    assert via_tables == via_frame

    inp = tmp_path / "drop"
    inp.mkdir()
    idx = str(tmp_path / "index")
    cur = str(tmp_path / "curated")
    names = lambda: {  # noqa: E731
        r["path"].rsplit("/", 1)[-1] for r in spark.read.parquet(cur).collect()
    }
    kw = dict(pattern="*.txt", min_tokens=5, lm_model_dir=mdir)

    # drain 1: in-model text scores high; out-of-domain soup scores the
    # smoothing floor ln(1/V) < every model self-score < the q=0.1 cutoff
    (inp / "good.txt").write_text("alpha beta " * 6)
    (inp / "ood.txt").write_text(" ".join(f"q{j}z" for j in range(10)))
    (inp / "short.txt").write_text("tiny doc")
    curation_ingest_file_stream(
        spark, str(inp), idx, cur, str(tmp_path / "ckpt1"), **kw
    )
    assert names() == {"good.txt"}
    # frozen-band reject is dropped BEFORE the index (deterministic
    # content property — unlike the batch-local band, which indexes its
    # drops because their verdict depends on batch composition)
    assert spark.read.parquet(idx).select("_id").distinct().count() == 1

    # drain 2: a near-dup of good is rejected as DUPLICATE; a fresh
    # in-model doc lands; a near-dup of the ood reject re-fails on
    # CONTENT (frozen verdict), never reaching the index
    (inp / "good2.txt").write_text("alpha  beta " * 6)   # same normalized
    (inp / "fresh.txt").write_text("gamma delta " * 6)
    (inp / "ood2.txt").write_text(" ".join(f"q{j}z" for j in range(10)) + " ")
    curation_ingest_file_stream(
        spark, str(inp), idx, cur, str(tmp_path / "ckpt1"), **kw
    )
    assert names() == {"good.txt", "fresh.txt"}
    assert spark.read.parquet(idx).select("_id").distinct().count() == 2

    # restart with a FRESH checkpoint into FRESH output dirs: the full
    # drop zone replays in ONE batch, and because the frozen verdicts
    # are content-determined, the curated CONTENT set is reproduced
    # exactly. The near-dup representative may differ (good vs good2 now
    # tie-break inside one batch instead of first-drain-wins) — content
    # identity, not path identity, is the replay invariant. The OLD dirs
    # are refused (ownership guard): a fresh checkpoint's restarted
    # batch counter over the two-drain dirs would strand drain 2's
    # partition as a stale duplicate — the r14-verdict hazard
    import pytest as _pytest

    with _pytest.raises(ValueError, match="must not share"):
        curation_ingest_file_stream(
            spark, str(inp), idx, cur, str(tmp_path / "ckpt2"), **kw
        )
    curR = str(tmp_path / "curated_replay")
    idxR = str(tmp_path / "index_replay")
    curation_ingest_file_stream(
        spark, str(inp), idxR, curR, str(tmp_path / "ckpt2"), **kw
    )
    replayed = {
        r["path"].rsplit("/", 1)[-1]
        for r in spark.read.parquet(curR).collect()
    }
    assert len(replayed) == 2 and "fresh.txt" in replayed
    assert replayed & {"good.txt", "good2.txt"}

    # explicit absolute cutoff overrides the calibrated one: a cutoff
    # above every score (avg logprobs are negative) rejects the whole
    # drop zone before the index — nothing lands in fresh output dirs
    # (an empty batch writes no partitions, so prior landings would be
    # untouched: fresh dirs isolate the verdict)
    import os

    cur2 = str(tmp_path / "curated2")
    idx2 = str(tmp_path / "index2")
    curation_ingest_file_stream(
        spark, str(inp), idx2, cur2, str(tmp_path / "ckpt3"),
        pattern="*.txt", min_tokens=5, lm_model_dir=mdir,
        lm_min_logprob=0.0,
    )
    assert not os.path.exists(cur2) or not [
        f for f in os.listdir(cur2) if f.startswith("_batch")
    ]


def test_stream_upsert_maintains_secondary_index(spark, tmp_path):
    """Phoenix couples index maintenance to the write RPC; the micro-batch
    analogue: upsert_stream_to_widetable(maintain_indexes=...) appends an
    upsert-sized index delta per drain, so a lookup right after the drain
    is FRESH (no IndexStale, no rebuild) and matches scan-derived truth;
    a fresh-checkpoint replay stays idempotent."""
    import os

    from pyspark.sql import functions as F

    from learn_hbase_spark.streaming.events import upsert_stream_to_widetable
    from learn_hbase_spark.widetable import WideTable

    src = str(tmp_path / "src")
    ev = load_table(spark, SF, "events")
    ev.write.parquet(src)

    def etype_cells(batch):
        # one cell per user: rowkey = padded user id, fixed qualifier,
        # value = lexicographically-max event type (deterministic)
        return batch.groupBy(
            F.lpad(F.col("user_id").cast("string"), 8, "0").alias("rowkey")
        ).agg(
            F.max("event_type").alias("value")
        ).select(
            "rowkey", F.lit("bmz").alias("family"),
            F.lit("etype").alias("qualifier"), "value",
        )

    table = WideTable.create(spark, str(tmp_path / "wt"), ["bmz"])
    # seed one row so the base segment is non-empty, then index it
    table.put(spark.createDataFrame(
        [("00000000", "bmz", "etype", "seed")],
        "rowkey string, family string, qualifier string, value string",
    ))
    table.build_index("bmz", "etype")

    upsert_stream_to_widetable(
        read_event_stream(spark, src), table, str(tmp_path / "ckpt1"),
        cell_fn=etype_cells, maintain_indexes=(("bmz", "etype"),),
    )
    probe = etype_cells(ev).agg(F.max("value")).first()[0]
    want = sorted(
        r["rowkey"] for r in etype_cells(ev).collect() if r["value"] == probe
    )
    # FRESH lookup straight after the drain — the delta rode the write path
    got = sorted(
        r["rowkey"]
        for r in table.lookup_by_value("bmz", "etype", probe).collect()
    )
    assert got == want and len(got) > 0
    idx_root = table._index_path("bmz", "etype")
    deltas = [d for d in os.listdir(idx_root) if d.startswith("delta_")]
    assert len(deltas) >= 1  # maintenance wrote segments, not rebuilds

    # fresh-checkpoint replay: same cells land again (newer versions),
    # another delta appends, lookups unchanged — idempotent end-to-end
    upsert_stream_to_widetable(
        read_event_stream(spark, src), table, str(tmp_path / "ckpt2"),
        cell_fn=etype_cells, maintain_indexes=(("bmz", "etype"),),
    )
    again = sorted(
        r["rowkey"]
        for r in table.lookup_by_value("bmz", "etype", probe).collect()
    )
    assert again == want


def test_ann_index_ingest_stream_maintains_frozen_index(spark, tmp_path):
    """Streaming ANN-index maintenance: a frozen artifact gains each
    drained embedding batch as replay-idempotent delta segments; probes
    see new vectors through the base ∪ delta union; a replayed batch
    rewrites its own partition (no double-append); compaction folds the
    stack and leaves probes unchanged."""
    import random

    from learn_hbase_spark.operators import similarity
    from learn_hbase_spark.streaming.events import ann_index_ingest_stream

    from pyspark.sql import functions as F

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)
    ]
    base = spark.createDataFrame(
        rows[:40], "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "ann_artifact")
    similarity.freeze_ivf_pq(base, path, nlist=8, m=4, k_codes=8,
                             src_fingerprint="base")

    drop = tmp_path / "drop"
    drop.mkdir()
    spark.createDataFrame(
        rows[40:50], "vec_id long, embedding array<double>"
    ).write.parquet(str(drop / "day1.parquet"))
    ann_index_ingest_stream(
        spark, str(drop), path, str(tmp_path / "ckpt")
    )
    # second drain: only the NEW file lands
    spark.createDataFrame(
        rows[50:60], "vec_id long, embedding array<double>"
    ).write.parquet(str(drop / "day2.parquet"))
    ann_index_ingest_stream(
        spark, str(drop), path, str(tmp_path / "ckpt")
    )

    q = base.filter(F.col("vec_id") < 3)
    got = similarity.ivf_pq_topk_frozen(q, path, nprobe=8, k=60).collect()
    pool = {r["neighbor_id"] for r in got}
    assert any(40 <= n < 50 for n in pool) and any(n >= 50 for n in pool)
    n_cells = spark.read.parquet(f"{path}/cells").count() + spark.read.parquet(
        f"{path}/cells_delta"
    ).count()
    assert n_cells == 60

    # at-least-once replay: re-invoke the batch body with the same batch
    # id and data — the dynamic partition overwrite rewrites, not appends
    replay = spark.createDataFrame(
        rows[40:50], "vec_id long, embedding array<double>"
    )
    similarity.ann_index_ingest_batch(replay, 0, path)
    n_after = spark.read.parquet(f"{path}/cells").count() + spark.read.parquet(
        f"{path}/cells_delta"
    ).count()
    assert n_after == 60

    before = sorted(tuple(r) for r in got)
    similarity.compact_ivf_pq(spark, path)
    import os as _os

    assert not _os.path.exists(f"{path}/cells_delta")
    assert spark.read.parquet(f"{path}/cells").count() == 60
    after = sorted(
        tuple(r)
        for r in similarity.ivf_pq_topk_frozen(
            q, path, nprobe=8, k=60
        ).collect()
    )
    assert after == before
    # meta survived the compact round-trip
    assert similarity.ivf_pq_fresh(spark, path, "base", nlist=8, m=4,
                                   k_codes=8)


def test_ann_compact_resumes_after_crash_and_probe_dedups_replays(
    spark, tmp_path
):
    """Two crash-anomaly contracts: (1) a compact that died after
    tombstoning the live meta is RESUMABLE from the meta_compact sidecar
    (not a bricked artifact); (2) a vector present in base AND a delta —
    the checkpoint-rollback replay anomaly — must not have its ADC
    distance inflated by the duplicate rows."""
    import random

    from pyspark.sql import functions as F

    from learn_hbase_spark.operators import similarity

    rng = random.Random(13)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(40)]
    all_vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "art")
    similarity.freeze_ivf_pq(all_vecs, path, nlist=8, m=4, k_codes=8,
                             src_fingerprint="v1")
    q = all_vecs.filter(F.col("vec_id") < 3)
    clean = sorted(
        tuple(r)
        for r in similarity.ivf_pq_topk_frozen(q, path, nprobe=8, k=40)
        .collect()
    )

    # (2) replay anomaly: re-land vectors 10..20 (already in base) as a
    # delta batch — the probe must return EXACTLY the clean answer
    dup = all_vecs.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 20))
    similarity.ann_index_ingest_batch(dup, 7, path)
    with_dup = sorted(
        tuple(r)
        for r in similarity.ivf_pq_topk_frozen(q, path, nprobe=8, k=40)
        .collect()
    )
    assert with_dup == clean

    # (1) crash mid-compact: simulate by doing what compact does before
    # dying — sidecar written, live meta tombstoned, nothing folded
    meta = similarity.ivf_pq_meta(spark, path)
    spark.createDataFrame([tuple(meta)], similarity._META_SCHEMA).write.mode(
        "overwrite"
    ).parquet(f"{path}/meta_compact")
    spark.createDataFrame(
        [similarity._meta_tombstone()], similarity._META_SCHEMA
    ).write.mode("overwrite").parquet(f"{path}/meta")
    import pytest

    with pytest.raises(ValueError, match="no complete IVF-PQ artifact"):
        similarity.ivf_pq_topk_frozen(q, path)  # mid-compact: refuse
    similarity.compact_ivf_pq(spark, path)  # resume from the sidecar
    import os as _os

    assert not _os.path.exists(f"{path}/cells_delta")
    assert not _os.path.exists(f"{path}/meta_compact")
    assert similarity.ivf_pq_fresh(spark, path, "v1", nlist=8, m=4,
                                   k_codes=8)
    after = sorted(
        tuple(r)
        for r in similarity.ivf_pq_topk_frozen(q, path, nprobe=8, k=40)
        .collect()
    )
    assert after == clean
    # base stayed duplicate-free through the fold
    assert spark.read.parquet(f"{path}/cells").count() == 40


def test_ann_compact_swap_and_cleanup_windows(spark, tmp_path):
    """The remaining compact crash windows: (a) base renamed to trash,
    tmp complete, nothing folded-in yet → resume swaps the staged tmp in
    without data loss; (b) an interrupted rmtree leaving an EMPTY delta
    dir reads as absent (probe and compact proceed) instead of raising
    UNABLE_TO_INFER_SCHEMA forever; (c) a tombstoned meta with NO
    recovery sidecar refuses compact (a crashed extend must not be
    'resumed' into validity)."""
    import os
    import random
    import shutil

    from pyspark.sql import functions as F

    from learn_hbase_spark.operators import similarity

    rng = random.Random(17)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(30)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "art")
    similarity.freeze_ivf_pq(vecs, path, nlist=8, m=4, k_codes=8,
                             src_fingerprint="v1")
    q = vecs.filter(F.col("vec_id") < 2)
    clean = sorted(
        tuple(r)
        for r in similarity.ivf_pq_topk_frozen(q, path, nprobe=8, k=30)
        .collect()
    )

    # (a) simulate the between-renames window: land a delta, stage the
    # fold to tmp, move base to trash, tombstone + sidecar — then resume
    extra = spark.createDataFrame(
        [(100, rows[0][1])], "vec_id long, embedding array<double>"
    )
    similarity.ann_index_ingest_batch(extra, 0, path)
    meta = similarity.ivf_pq_meta(spark, path)
    base = spark.read.parquet(f"{path}/cells")
    delta = spark.read.parquet(f"{path}/cells_delta")
    base.unionByName(delta.drop("_batch")).distinct().write.parquet(
        f"{path}/cells_tmp"
    )
    os.rename(f"{path}/cells", f"{path}/cells_trash")
    spark.createDataFrame([tuple(meta)], similarity._META_SCHEMA).write.mode(
        "overwrite"
    ).parquet(f"{path}/meta_compact")
    spark.createDataFrame(
        [similarity._meta_tombstone()], similarity._META_SCHEMA
    ).write.mode("overwrite").parquet(f"{path}/meta")

    similarity.compact_ivf_pq(spark, path)
    assert spark.read.parquet(f"{path}/cells").count() == 31
    assert not os.path.exists(f"{path}/cells_trash")
    assert not os.path.exists(f"{path}/cells_tmp")
    assert similarity.ivf_pq_fresh(spark, path, "v1", nlist=8, m=4,
                                   k_codes=8)

    # (b) interrupted-rmtree empty delta dir: probe still answers
    os.makedirs(f"{path}/codes_delta", exist_ok=True)
    for f_ in os.listdir(f"{path}/codes_delta"):
        shutil.rmtree(f"{path}/codes_delta/{f_}", ignore_errors=True)
    got = sorted(
        tuple(r)
        for r in similarity.ivf_pq_topk_frozen(q, path, nprobe=8, k=30)
        .collect()
    )
    assert {t[1] for t in got} >= {t[1] for t in clean}
    shutil.rmtree(f"{path}/codes_delta", ignore_errors=True)

    # (c) a crashed EXTEND (tombstone, no sidecar) must refuse compact
    import pytest

    spark.createDataFrame(
        [similarity._meta_tombstone()], similarity._META_SCHEMA
    ).write.mode("overwrite").parquet(f"{path}/meta")
    with pytest.raises(ValueError, match="to compact"):
        similarity.compact_ivf_pq(spark, path)


def test_ann_delta_stack_auto_compacts(spark, tmp_path):
    """VERDICT r12 #3: the streaming delta stack is self-bounding — a
    drain that pushes the ``_batch`` partition count past the threshold
    folds the stack into base before the next drain, so an unattended
    maintained stream never grows the probe's base ∪ delta union or its
    file listing without limit. Probe answers must be IDENTICAL to an
    artifact maintained with no auto-fold (encoding against frozen
    quantizers is deterministic; the fold only moves rows)."""
    import os
    import random

    from pyspark.sql import functions as F

    from learn_hbase_spark.operators import similarity

    rng = random.Random(19)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(70)]
    base = spark.createDataFrame(
        rows[:40], "vec_id long, embedding array<double>"
    )
    folded_p = str(tmp_path / "folded")
    plain_p = str(tmp_path / "plain")
    for p in (folded_p, plain_p):
        similarity.freeze_ivf_pq(base, p, nlist=8, m=4, k_codes=8,
                                 src_fingerprint="base")

    # six drains of five vectors; threshold 2 → at least one auto-fold
    for b, lo in enumerate(range(40, 70, 5)):
        batch = spark.createDataFrame(
            rows[lo:lo + 5], "vec_id long, embedding array<double>"
        )
        similarity.ann_index_ingest_batch(
            batch, b, folded_p, compact_threshold=2
        )
        similarity.ann_index_ingest_batch(batch, b, plain_p)

    def _nparts(p):
        try:
            return sum(
                1 for n in os.listdir(p) if n.startswith("_batch=")
            )
        except FileNotFoundError:
            return 0

    assert _nparts(f"{folded_p}/cells_delta") <= 2  # stack stayed bounded
    assert _nparts(f"{plain_p}/cells_delta") == 6  # control: no fold
    # no rows lost or duplicated across the folds
    n_base = spark.read.parquet(f"{folded_p}/cells").count()
    n_delta = (
        spark.read.parquet(f"{folded_p}/cells_delta").count()
        if os.path.exists(f"{folded_p}/cells_delta")
        else 0
    )
    assert n_base + n_delta == 70
    # meta survived every fold round-trip
    assert similarity.ivf_pq_fresh(spark, folded_p, "base", nlist=8, m=4,
                                   k_codes=8)

    q = base.filter(F.col("vec_id") < 3)
    got_folded = sorted(
        tuple(r)
        for r in similarity.ivf_pq_topk_frozen(
            q, folded_p, nprobe=8, k=70
        ).collect()
    )
    got_plain = sorted(
        tuple(r)
        for r in similarity.ivf_pq_topk_frozen(
            q, plain_p, nprobe=8, k=70
        ).collect()
    )
    assert got_folded == got_plain


def test_ann_probe_stream_serves_frozen_index(spark, tmp_path):
    """Streaming ANN serving: query vectors dropped into a directory are
    probed against the frozen artifact per drain (probe-only cost) and
    land replay-idempotently under their own _batch partition; a second
    drain probes only the NEW file; results equal the batch probe."""
    import os
    import random

    from pyspark.sql import functions as F

    from learn_hbase_spark.operators import similarity
    from learn_hbase_spark.streaming.events import ann_probe_stream

    rng = random.Random(31)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(40)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    art = str(tmp_path / "art")
    similarity.freeze_ivf_pq(corpus, art, nlist=8, m=4, k_codes=8,
                             src_fingerprint="v1")

    drop = tmp_path / "queries"
    drop.mkdir()
    out = str(tmp_path / "results")
    ckpt = str(tmp_path / "ckpt")
    q1 = corpus.filter(F.col("vec_id") < 3)
    q1.write.parquet(str(drop / "q1.parquet"))
    ann_probe_stream(spark, str(drop), art, out, ckpt, nprobe=4, k=5)

    got1 = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["dist"])
        for r in spark.read.parquet(out).drop("_batch").collect()
    )
    want1 = sorted(
        tuple(r)
        for r in similarity.ivf_pq_topk_frozen(
            q1, art, nprobe=4, k=5
        ).collect()
    )
    assert got1 == want1 and len(got1) > 0

    # second drain: only the new file's queries are probed and appended
    q2 = corpus.filter(
        (F.col("vec_id") >= 3) & (F.col("vec_id") < 5)
    )
    q2.write.parquet(str(drop / "q2.parquet"))
    ann_probe_stream(spark, str(drop), art, out, ckpt, nprobe=4, k=5)
    all_q = corpus.filter(F.col("vec_id") < 5)
    want_all = sorted(
        tuple(r)
        for r in similarity.ivf_pq_topk_frozen(
            all_q, art, nprobe=4, k=5
        ).collect()
    )
    got_all = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["dist"])
        for r in spark.read.parquet(out).drop("_batch").collect()
    )
    assert got_all == want_all

    # at-least-once replay: re-running the same drained input with the
    # same checkpoint is a no-op; and the batch body re-invoked with an
    # already-landed batch id rewrites, not double-appends
    ann_probe_stream(spark, str(drop), art, out, ckpt, nprobe=4, k=5)
    assert sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["dist"])
        for r in spark.read.parquet(out).drop("_batch").collect()
    ) == want_all
    n_batches = len(
        [d for d in os.listdir(out) if d.startswith("_batch=")]
    )
    assert n_batches == 2


def _tiny_frozen_artifact(spark, tmp_path, seed=47, n=40, name="art"):
    """A small frozen IVF-PQ artifact plus its corpus — shared fixture for
    the serving-stream crash/ownership tests."""
    import random

    from learn_hbase_spark.operators import similarity

    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(n)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    art = str(tmp_path / name)
    similarity.freeze_ivf_pq(corpus, art, nlist=8, m=4, k_codes=8,
                             src_fingerprint="v1")
    return corpus, art


def test_ann_probe_stream_tombstone_race_fails_loud_then_resumes(
    spark, tmp_path
):
    """The documented probe-vs-fold contract, PINNED: a probe drain that
    lands inside a freeze/extend's meta-tombstone window (tombstone, NO
    recovery sidecar — nothing complete to resume to) fails loudly
    instead of serving from a torn artifact; after meta is restored, a
    restart replays the failed drain from the checkpoint and serves the
    correct answers."""
    import pytest
    from pyspark.errors import StreamingQueryException
    from pyspark.sql import functions as F

    from learn_hbase_spark.operators import similarity
    from learn_hbase_spark.streaming.events import ann_probe_stream

    corpus, art = _tiny_frozen_artifact(spark, tmp_path)
    drop = tmp_path / "queries"
    drop.mkdir()
    out = str(tmp_path / "results")
    ckpt = str(tmp_path / "ckpt")

    q1 = corpus.filter(F.col("vec_id") < 3)
    q1.write.parquet(str(drop / "q1.parquet"))
    ann_probe_stream(spark, str(drop), art, out, ckpt, nprobe=4, k=5)

    # freeze/extend crash simulation: live meta tombstoned, no sidecar
    saved = similarity._meta_values(similarity.ivf_pq_meta(spark, art))
    spark.createDataFrame(
        [similarity._meta_tombstone()], similarity._META_SCHEMA
    ).write.mode("overwrite").parquet(f"{art}/meta")

    q2 = corpus.filter((F.col("vec_id") >= 3) & (F.col("vec_id") < 5))
    q2.write.parquet(str(drop / "q2.parquet"))
    with pytest.raises(StreamingQueryException, match="no complete IVF-PQ"):
        ann_probe_stream(spark, str(drop), art, out, ckpt, nprobe=4, k=5)

    # restore meta (the freeze/extend completing) and restart: the
    # checkpoint replays the failed drain, output converges
    spark.createDataFrame(
        [saved], similarity._META_SCHEMA
    ).write.mode("overwrite").parquet(f"{art}/meta")
    ann_probe_stream(spark, str(drop), art, out, ckpt, nprobe=4, k=5)
    want = sorted(
        tuple(r)
        for r in similarity.ivf_pq_topk_frozen(
            corpus.filter(F.col("vec_id") < 5), art, nprobe=4, k=5
        ).collect()
    )
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["dist"])
        for r in spark.read.parquet(out).drop("_batch").collect()
    )
    assert got == want and len(got) > 0


def test_ann_streams_self_heal_a_crashed_compact(spark, tmp_path):
    """ADVICE r13: a crash mid-``compact_ivf_pq`` (meta tombstoned, the
    ``meta_compact`` recovery sidecar still present) must not wedge the
    unattended streams — both the ingest body and the serving drain
    resume the fold before refusing, so the self-bounding auto-compact
    promise survives its own crash."""
    from pyspark.sql import functions as F

    from learn_hbase_spark.operators import similarity
    from learn_hbase_spark.streaming.events import ann_probe_stream

    corpus, art = _tiny_frozen_artifact(spark, tmp_path)

    def crash_mid_compact():
        # exactly compact's step-1 state: sidecar saved, live tombstoned
        saved = similarity._meta_values(similarity.ivf_pq_meta(spark, art))
        spark.createDataFrame(
            [saved], similarity._META_SCHEMA
        ).write.mode("overwrite").parquet(f"{art}/meta_compact")
        spark.createDataFrame(
            [similarity._meta_tombstone()], similarity._META_SCHEMA
        ).write.mode("overwrite").parquet(f"{art}/meta")

    # (a) the ingest body resumes and then lands its batch
    crash_mid_compact()
    batch = spark.createDataFrame(
        [(100, [0.5] * 16)], "vec_id long, embedding array<double>"
    )
    similarity.ann_index_ingest_batch(batch, 0, art)
    meta = similarity.ivf_pq_meta(spark, art)
    assert meta is not None and int(meta["nlist"]) == 8  # healed
    import os

    assert os.path.exists(f"{art}/cells_delta")  # and the batch landed

    # (b) the serving drain resumes and probes
    crash_mid_compact()
    drop = tmp_path / "queries"
    drop.mkdir()
    out = str(tmp_path / "results")
    ckpt = str(tmp_path / "ckpt")
    corpus.filter(F.col("vec_id") < 2).write.parquet(str(drop / "q.parquet"))
    ann_probe_stream(spark, str(drop), art, out, ckpt, nprobe=4, k=5)
    assert spark.read.parquet(out).count() > 0
    meta = similarity.ivf_pq_meta(spark, art)
    assert meta is not None and int(meta["nlist"]) == 8
    # the resume folded the crashed state's delta into base
    assert not os.path.exists(f"{art}/meta_compact")


def test_ann_probe_stream_refuses_unowned_output_dir(spark, tmp_path):
    """Output-ownership hardening: ``_batch`` partition numbers are only
    meaningful relative to ONE checkpoint's counter, so (a) a second
    stream with a different checkpoint must refuse to serve into an
    output dir another stream owns, and (b) a stream whose checkpoint
    was deleted must refuse its old output dir (the reset counter would
    leave stale partitions the re-run never rewrites)."""
    import shutil

    import pytest
    from pyspark.sql import functions as F

    from learn_hbase_spark.streaming.events import ann_probe_stream

    corpus, art = _tiny_frozen_artifact(spark, tmp_path)
    drop = tmp_path / "queries"
    drop.mkdir()
    out = str(tmp_path / "results")
    ckpt1 = str(tmp_path / "ckpt1")
    corpus.filter(F.col("vec_id") < 3).write.parquet(str(drop / "q.parquet"))
    ann_probe_stream(spark, str(drop), art, out, ckpt1, nprobe=4, k=5)
    served = spark.read.parquet(out).count()
    assert served > 0

    # (a) a different checkpoint against the same output dir: refused
    # loudly BEFORE any write, output untouched
    with pytest.raises(ValueError, match="must not share"):
        ann_probe_stream(
            spark, str(drop), art, out, str(tmp_path / "ckpt2"),
            nprobe=4, k=5,
        )
    assert spark.read.parquet(out).count() == served

    # (b) the owning checkpoint deleted (counter reset): refused too
    shutil.rmtree(ckpt1)
    with pytest.raises(ValueError, match="no committed batches"):
        ann_probe_stream(spark, str(drop), art, out, ckpt1, nprobe=4, k=5)
    assert spark.read.parquet(out).count() == served


def test_neardup_ingest_refuses_unowned_output_dirs(spark, tmp_path):
    """The ownership guard retrofitted to the older ingest streams
    (VERDICT r14): a second checkpoint must not land into an accepted /
    index dir another stream owns (cross-overwrite of the curated corpus
    and the band index), and a reset checkpoint must refuse its old
    dirs — same contract as ``ann_probe_stream``."""
    import json
    import shutil

    import pytest

    from learn_hbase_spark.streaming.events import neardup_ingest_stream

    inp = tmp_path / "in"
    inp.mkdir()
    idx = str(tmp_path / "index")
    acc = str(tmp_path / "accepted")
    ckpt1 = str(tmp_path / "ckpt1")
    with open(inp / "b1.json", "w") as fh:
        fh.write(json.dumps({"doc_id": 1, "text": "alpha beta gamma"}) + "\n")
    neardup_ingest_stream(spark, str(inp), idx, acc, ckpt1)
    accepted = spark.read.parquet(acc).count()
    assert accepted == 1

    # (a) a different checkpoint against the same dirs: refused loudly
    # BEFORE any write, both outputs untouched
    with pytest.raises(ValueError, match="must not share"):
        neardup_ingest_stream(
            spark, str(inp), idx, acc, str(tmp_path / "ckpt2")
        )
    assert spark.read.parquet(acc).count() == accepted

    # (b) the owning checkpoint deleted (counter reset): refused too
    shutil.rmtree(ckpt1)
    with pytest.raises(ValueError, match="no committed batches"):
        neardup_ingest_stream(spark, str(inp), idx, acc, ckpt1)
    assert spark.read.parquet(acc).count() == accepted


def test_ingest_guard_adopts_preguard_output_dirs(spark, tmp_path):
    """Migration: output dirs written BEFORE the ownership guard existed
    have _batch=* partitions but no sidecar. The legitimate owner — a
    checkpoint WITH committed batches — must be adopted on restart (not
    stranded), while a fresh/reset checkpoint over the unowned populated
    dir still refuses."""
    import json
    import os

    import pytest

    from learn_hbase_spark.streaming.events import neardup_ingest_stream

    inp = tmp_path / "in"
    inp.mkdir()
    idx = str(tmp_path / "index")
    acc = str(tmp_path / "accepted")
    ckpt = str(tmp_path / "ckpt")
    with open(inp / "b1.json", "w") as fh:
        fh.write(json.dumps({"doc_id": 1, "text": "alpha beta gamma"}) + "\n")
    neardup_ingest_stream(spark, str(inp), idx, acc, ckpt)
    # simulate the pre-guard state: partitions present, sidecar absent
    for d in (idx, acc):
        os.remove(f"{d}/_ingest_owner")
    with open(inp / "b2.json", "w") as fh:
        fh.write(json.dumps({"doc_id": 2, "text": "delta epsilon zeta"}) + "\n")
    # the owning (committed) checkpoint restarts: adopted, state grows
    neardup_ingest_stream(spark, str(inp), idx, acc, ckpt)
    assert {r["doc_id"] for r in spark.read.parquet(acc).collect()} == {1, 2}
    assert os.path.exists(f"{acc}/_ingest_owner")

    # a FRESH checkpoint over the unowned populated dir: still refused
    for d in (idx, acc):
        os.remove(f"{d}/_ingest_owner")
    with pytest.raises(ValueError, match="must not share"):
        neardup_ingest_stream(
            spark, str(inp), idx, acc, str(tmp_path / "ckpt_new")
        )


def test_claim_guard_allows_crash_before_first_commit(spark, tmp_path):
    """The guard keys on recorded OFFSETS, not commits: offsets/N is
    written before batch N runs, so a crash after the output landed but
    before the commit record leaves offsets-without-commits — the SAME
    checkpoint's restart must be allowed (the engine replays batch N
    over its own partition), or the stream's first mid-batch crash
    wedges it permanently. A checkpoint with neither (deleted/reset)
    still refuses."""
    import os

    import pytest

    from learn_hbase_spark.streaming.events import _claim_stream_output

    out = tmp_path / "out"
    (out / "_batch=0").mkdir(parents=True)
    (out / "_batch=0" / "part-0.parquet").write_bytes(b"")
    ckpt = tmp_path / "ckpt"
    (ckpt / "offsets").mkdir(parents=True)
    (ckpt / "offsets" / "0").write_text("v1")
    # exactly the crash state: output landed, sidecar stamped, offsets
    # recorded, NO commit yet
    _claim_stream_output(spark, str(out), str(ckpt), "_owner")  # stamps
    _claim_stream_output(spark, str(out), str(ckpt), "_owner")  # resumes
    # reset checkpoint (no offsets, no commits): refused
    os.remove(ckpt / "offsets" / "0")
    with pytest.raises(ValueError, match="no committed batches"):
        _claim_stream_output(spark, str(out), str(ckpt), "_owner")


def test_curation_ingest_refuses_unowned_output_dirs(spark, tmp_path):
    """Same ownership contract for the curation file stream's curated /
    index dirs."""
    import shutil

    import pytest

    from learn_hbase_spark.streaming.events import curation_ingest_file_stream

    drop = tmp_path / "drop"
    drop.mkdir()
    idx = str(tmp_path / "index")
    cur = str(tmp_path / "curated")
    ckpt1 = str(tmp_path / "ckpt1")
    (drop / "d1.txt").write_text(
        "plenty of perfectly ordinary words to clear the token floor here"
    )
    curation_ingest_file_stream(spark, str(drop), idx, cur, ckpt1)
    curated = spark.read.parquet(cur).count()
    assert curated == 1

    with pytest.raises(ValueError, match="must not share"):
        curation_ingest_file_stream(
            spark, str(drop), idx, cur, str(tmp_path / "ckpt2")
        )
    assert spark.read.parquet(cur).count() == curated

    shutil.rmtree(ckpt1)
    with pytest.raises(ValueError, match="no committed batches"):
        curation_ingest_file_stream(spark, str(drop), idx, cur, ckpt1)
    assert spark.read.parquet(cur).count() == curated


def test_media_feature_stream_decodes_new_files_per_drain(spark, tmp_path):
    """Streaming multimodal features over a drop zone: drain 1 decodes
    the first BMP + WAV with the REAL codecs (values match NumPy
    references), drain 2 touches only the newly dropped file, unknown
    kinds get the payload profile row, replay with the same checkpoint
    is a no-op, and a second stream on the same output dir is refused."""
    import hashlib

    import numpy as np
    import pytest

    from learn_hbase_spark.operators import multimodal
    from learn_hbase_spark.streaming.events import media_feature_stream

    drop = tmp_path / "media"
    drop.mkdir()
    px = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3) % 251
    (drop / "a.bmp").write_bytes(multimodal.encode_bmp(px))
    s = (np.arange(-50, 50, dtype=np.int64) * 300).astype(np.int16)
    (drop / "b.wav").write_bytes(multimodal.encode_wav_pcm16(s, 16000))
    (drop / "c.bin").write_bytes(b"\x00opaque")
    # an image-KIND file in a format the real codecs can't parse: must
    # route to the profile row (decode_note marker), never to decode_bmp
    # — one JPEG in a mixed zone must not wedge the stream
    (drop / "e.jpg").write_bytes(b"\xff\xd8\xff\xe0notabmp")
    # a decodable VIDEO: real AVI decode fills geometry/means/n_frames
    vf = (np.arange(3 * 4 * 6 * 3, dtype=np.int64) % 256).astype(
        np.uint8
    ).reshape(3, 4, 6, 3)
    (drop / "v.avi").write_bytes(multimodal.encode_avi(vf, fps=2))

    out = str(tmp_path / "features")
    ckpt = str(tmp_path / "ckpt")
    media_feature_stream(spark, str(drop), out, ckpt)

    def by_name():
        rows = spark.read.parquet(out).collect()
        got = {}
        for r in rows:
            got[r["path"].rsplit("/", 1)[-1]] = r.asDict()
        return got

    got = by_name()
    assert set(got) == {"a.bmp", "b.wav", "c.bin", "e.jpg", "v.avi"}
    jpg = got["e.jpg"]
    assert (jpg["kind"], jpg["width"], jpg["decode_note"]) == (
        "image", None, "undecodable_format",
    )
    img = got["a.bmp"]
    assert img["decode_note"] is None
    vid = got["v.avi"]
    assert (vid["kind"], vid["width"], vid["height"], vid["n_frames"]) == (
        "video", 6, 4, 3,
    )
    vmeans = vf.astype(np.float64).mean(axis=(0, 1, 2))
    assert vid["mean_g"] == round(float(vmeans[1]), 6)
    assert vid["decode_note"] is None and vid["sample_rate"] is None
    assert (img["kind"], img["width"], img["height"]) == ("image", 5, 4)
    means = px.astype(np.float64).mean(axis=(0, 1))
    assert img["mean_b"] == round(float(means[0]), 6)
    aud = got["b.wav"]
    assert (aud["kind"], aud["sample_rate"], aud["n_samples"]) == (
        "audio", 16000, 100,
    )
    s64 = s.astype(np.int64)
    assert aud["rms"] == round(float(np.sqrt((s64 * s64).mean())), 6)
    assert aud["peak"] == int(np.abs(s64).max())
    other = got["c.bin"]
    assert other["kind"] == "binary" and other["width"] is None
    assert other["n_bytes"] == 7
    # media_id follows the read_binary_files rule: md5 of the source path
    assert img["media_id"] == hashlib.md5(
        img["path"].encode()
    ).hexdigest()

    # drain 2: only the new file is decoded and appended
    px2 = (px[::-1] + 7).astype(np.uint8)
    (drop / "d.bmp").write_bytes(multimodal.encode_bmp(px2))
    media_feature_stream(spark, str(drop), out, ckpt)
    got2 = by_name()
    assert set(got2) == {"a.bmp", "b.wav", "c.bin", "e.jpg", "v.avi",
                         "d.bmp"}
    means2 = px2.astype(np.float64).mean(axis=(0, 1))
    assert got2["d.bmp"]["mean_g"] == round(float(means2[1]), 6)

    # replay: same checkpoint, no new files -> no-op
    media_feature_stream(spark, str(drop), out, ckpt)
    assert len(by_name()) == 6

    # ownership: a different checkpoint must not serve into this dir
    with pytest.raises(ValueError, match="must not share"):
        media_feature_stream(
            spark, str(drop), out, str(tmp_path / "ckpt2")
        )

    # schema versioning: a pre-v2 dir (partitions, no _media_schema
    # stamp) must refuse toward a fresh dir, not mix parquet schemas
    import os

    os.remove(f"{out}/_media_schema")
    with pytest.raises(ValueError, match="schema"):
        media_feature_stream(spark, str(drop), out, ckpt)

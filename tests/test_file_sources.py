"""CSV / JSON-lines sources: schema enforcement, corrupt-record routing,
and CSV round-trip through the S7 sink."""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from learn_hbase_spark.sources.csv_sink import write_csv
from learn_hbase_spark.sources.files import read_csv, read_jsonl, split_corrupt

SCHEMA = StructType(
    [
        StructField("id", IntegerType(), True),
        StructField("name", StringType(), True),
    ]
)


def test_csv_round_trip_through_sink(spark, tmp_path):
    src = spark.createDataFrame([(1, "a"), (2, None)], SCHEMA)
    out = str(tmp_path / "csv")
    write_csv(src, out)
    back = read_csv(spark, out, SCHEMA)
    good, bad = split_corrupt(back)
    assert bad.count() == 0
    rows = {r["id"]: r["name"] for r in good.collect()}
    # nullValue="" renders null as empty; the reader reads "" back as null
    assert rows == {1: "a", 2: None}


def test_jsonl_corrupt_records_quarantined(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text('{"id": 1, "name": "ok"}\n{broken json\n{"id": 2}\n')
    df = read_jsonl(spark, str(p), SCHEMA)
    good, bad = split_corrupt(df)
    assert {r["id"] for r in good.collect()} == {1, 2}
    quarantined = [r[0] for r in bad.collect()]
    assert quarantined == ["{broken json"]


def test_csv_type_mismatch_is_corrupt_not_fatal(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,name\n1,a\nnot_an_int,b\n")
    df = read_csv(spark, str(p), SCHEMA)
    good, bad = split_corrupt(df)
    assert [r["id"] for r in good.collect()] == [1]
    assert bad.count() == 1


def test_orc_round_trip_preserves_rows_and_pushdown(spark, tmp_path):
    from pyspark.sql import functions as F

    from learn_hbase_spark.sources.files import read_orc, write_orc
    from learn_hbase_spark.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    out = str(tmp_path / "orc")
    write_orc(li, out, partition_by=["l_returnflag"])
    back = read_orc(spark, out)
    assert back.count() == li.count()
    # partition column survives and selective reads prune + push down
    scan = back.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_quantity") > 30)
    )
    expected = li.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_quantity") > 30)
    ).count()
    assert scan.count() == expected
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan


def test_xml_round_trip_and_corrupt_capture(spark, tmp_path):
    from learn_hbase_spark.sources.files import read_xml, write_xml

    src = spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA)
    out = str(tmp_path / "xml")
    write_xml(src, out)
    back = read_xml(spark, out, SCHEMA)
    good, bad = split_corrupt(back)
    assert bad.count() == 0
    assert sorted((r["id"], r["name"]) for r in good.collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    # malformed element -> quarantined, not fatal / not dropped
    p = tmp_path / "bad.xml"
    p.write_text("<rows><row><id>1</id><name>ok</name></row>"
                 "<row><id>oops</id><name>x</name></row></rows>")
    df = read_xml(spark, str(p), SCHEMA)
    good2, bad2 = split_corrupt(df)
    assert [r["id"] for r in good2.collect()] == [1]
    assert bad2.count() == 1


def test_binary_file_ingest_feeds_multimodal(spark, tmp_path):
    """binaryFile source -> MEDIA-shaped frame -> the real mapInPandas
    feature kernel: kinds/mime from extension, deterministic path-hash
    ids, glob pruning at the listing, unknown extensions kept opaque."""
    from learn_hbase_spark.operators.multimodal import extract_features
    from learn_hbase_spark.sources.files import read_binary_files

    (tmp_path / "a.png").write_bytes(b"\x89PNG-fake")
    (tmp_path / "b.wav").write_bytes(b"RIFF-fake-audio")
    (tmp_path / "c.xyz").write_bytes(b"opaque")

    media = read_binary_files(spark, str(tmp_path))
    rows = {r["kind"]: r for r in media.collect()}
    assert set(rows) == {"image", "audio", "binary"}
    assert rows["image"]["mime"] == "image/png"
    assert rows["binary"]["mime"] == "application/octet-stream"
    assert rows["audio"]["n_bytes"] == len(b"RIFF-fake-audio")
    # 128-bit id semantics: 32-hex md5 of the path, unique per file —
    # a 64-bit id would silently birthday-merge files at crawl scale
    import re
    ids = [r["media_id"] for r in rows.values()]
    assert all(re.fullmatch(r"[0-9a-f]{32}", i) for i in ids)
    assert len(set(ids)) == len(ids)
    # deterministic ids across re-reads
    again = {r["path"]: r["media_id"] for r in read_binary_files(
        spark, str(tmp_path)).collect()}
    assert all(again[r["path"]] == r["media_id"] for r in rows.values())

    # glob pruning at the listing
    only_png = read_binary_files(spark, str(tmp_path), pattern="*.png")
    assert only_png.count() == 1

    feats = {
        r["kind"]: r for r in extract_features(media).collect()
    }
    assert feats["image"]["n_bytes"] == len(b"\x89PNG-fake")
    assert feats["image"]["checksum"] == sum(b"\x89PNG-fake") % (2**31)


def test_wholetext_ingest_feeds_dedup(spark, tmp_path):
    """text/wholetext source -> documents-shaped frame -> exact dedup:
    one document per file, stable path-hash ids, duplicate file contents
    collapse to one fingerprint winner."""
    from learn_hbase_spark.operators.dedup import exact_fingerprints
    from learn_hbase_spark.sources.files import read_text_docs

    (tmp_path / "d1.txt").write_text("alpha beta gamma")
    (tmp_path / "d2.txt").write_text("alpha  beta   GAMMA")  # near-identical
    (tmp_path / "d3.txt").write_text("totally different words")

    docs = read_text_docs(spark, str(tmp_path), pattern="*.txt")
    got = docs.collect()
    assert len(got) == 3
    assert {r["n_chars"] for r in got} == {16, 19, 23}
    # 128-bit id semantics (same contract as the binary edge)
    import re
    ids = [r["doc_id"] for r in got]
    assert all(re.fullmatch(r"[0-9a-f]{32}", i) for i in ids)
    assert len(set(ids)) == 3

    winners = exact_fingerprints(docs, "text", "doc_id").collect()
    # d1/d2 normalize identically -> one shared fingerprint, 2 total
    assert len(winners) == 2

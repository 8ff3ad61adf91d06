"""File sources: schema-enforced CSV / JSON-lines readers.

The reference's only source is JDBC (SURVEY §2.1 S1/S2); real deployments
of this engine also land files. The rules that matter at 100 TB:

- **Always pass an explicit schema.** Inference reads the data twice and
  pins the job to whatever the sampled files happened to contain; an
  explicit schema is one footer-free pass and a stable contract.
- **Never drop bad rows silently.** PERMISSIVE mode + a corrupt-record
  column turns malformed input into auditable rows (count them, route them
  to a quarantine sink) instead of a mid-job crash (FAILFAST) or silent
  loss (DROPMALFORMED).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Schema-enforced CSV read. Malformed lines surface in
    ``_corrupt_record`` (null for good rows) rather than failing the job
    or vanishing."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("header", header)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """Schema-enforced JSON-lines read with corrupt-record capture."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): route rows with a corrupt payload aside for
    audit instead of mixing half-parsed rows into the pipeline.

    The parsed frame is cached first: Spark refuses a query whose required
    schema is ONLY the internal corrupt-record column of a raw file scan
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the supported pattern is to
    materialize the parse once, then split. Both halves share that one
    scan; in a 100 TB ingest this split runs per landed batch, not over
    the full corpus, so the cache is batch-sized.
    """
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink (zlib default). ORC is the interchange format for
    Hive-ecosystem consumers the way parquet is for Spark-native ones;
    both carry column stats for predicate pushdown, so a table landed here
    stays scan-prunable."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """ORC source. Explicit schema skips footer sampling (same rule as the
    CSV/JSON readers above); ORC scans support filter pushdown and column
    pruning exactly like parquet, so downstream plans keep their shape."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML sink (Spark 4 native XML data source — no external package).
    XML is the land-from-enterprise-feeds format; one element per row."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode(mode)
        .save(path)
    )


def read_xml(
    spark: SparkSession,
    path: str,
    schema: StructType,
    row_tag: str = "row",
) -> DataFrame:
    """Schema-enforced XML read with corrupt-record capture — same
    PERMISSIVE + quarantine contract as the CSV/JSON readers (malformed
    elements become auditable rows, never silent drops)."""
    return (
        spark.read.format("xml")
        .schema(_with_corrupt(schema))
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .load(path)
    )


# Extension → (kind, mime) map for the binary-file ingest edge. Unknown
# extensions ingest as kind='binary' (opaque) rather than being dropped —
# a corpus crawl must never silently lose files.
_MEDIA_EXT = {
    "bmp": ("image", "image/bmp"),
    "jpg": ("image", "image/jpeg"),
    "jpeg": ("image", "image/jpeg"),
    "png": ("image", "image/png"),
    "wav": ("audio", "audio/wav"),
    "mp3": ("audio", "audio/mpeg"),
    "avi": ("video", "video/x-msvideo"),
    "mp4": ("video", "video/mp4"),
    "mkv": ("video", "video/x-matroska"),
}


def read_binary_files(
    spark: SparkSession, path: str, pattern: str | None = None
) -> DataFrame:
    """Raw media ingest via the built-in ``binaryFile`` source — the real
    file edge of the multimodal pipeline (media arrive as object-store
    files, not parquet rows): one row per file with
    ``(media_id, kind, payload, mime, path, n_bytes, mod_time)``.

    ``media_id`` is ``md5(path)`` (32-hex string) — deterministic across
    reruns AND collision-safe at crawl scale: a 64-bit path hash silently
    birthday-merges distinct files at ~1e9 files (~2.7% odds, growing
    quadratically), and a merged id is silent data loss inside exactly the
    dedup/feature tables this edge feeds; 128 bits puts the same bound at
    ~1e-20. ``path`` stays in the schema as the human-auditable key.

    NOTE on cross-reader id comparability: this reader's ``path`` column is
    the ``binaryFile`` source's URI form, while ``read_text_docs`` derives
    its path from ``input_file_name()`` — the two URI-encode differently
    (e.g. spaces), so ``media_id`` and ``doc_id`` are NOT comparable across
    the two readers for the same file. Join on nothing across them; each
    id is stable only within its own reader.

    ``kind``/``mime`` derive from the extension (unknown → opaque
    ``binary``). ``pattern`` rides ``pathGlobFilter``, pruning at the file
    LISTING — at 100 TB of crawl output the listing filter is the
    difference between planning over the selected files and over the
    bucket. The source streams file contents into the ``content`` binary
    column task-side (no driver involvement); feed the result to
    ``operators.multimodal.extract_features`` / ``resize_images`` — the
    batch shape those mapInPandas kernels expect (id-type-polymorphic:
    they copy this reader's string id type through).
    """
    reader = spark.read.format("binaryFile")
    if pattern is not None:
        reader = reader.option("pathGlobFilter", pattern)
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    kind_map = F.create_map(
        *[F.lit(x) for kv in _MEDIA_EXT.items() for x in (kv[0], kv[1][0])]
    )
    mime_map = F.create_map(
        *[F.lit(x) for kv in _MEDIA_EXT.items() for x in (kv[0], kv[1][1])]
    )
    return raw.select(
        F.md5(F.col("path").cast("binary")).alias("media_id"),
        F.coalesce(kind_map[ext], F.lit("binary")).alias("kind"),
        F.col("content").alias("payload"),
        F.coalesce(mime_map[ext], F.lit("application/octet-stream")).alias(
            "mime"
        ),
        F.col("path"),
        F.col("length").alias("n_bytes"),
        F.col("modificationTime").alias("mod_time"),
    )


def read_text_docs(
    spark: SparkSession, path: str, pattern: str | None = None
) -> DataFrame:
    """Raw text-corpus ingest: one DOCUMENT per file via the built-in
    ``text`` source with ``wholetext`` — the file edge feeding the dedup /
    curation operators when a corpus arrives as crawl files instead of
    parquet. Returns ``(doc_id, text, path, n_chars)`` with
    ``doc_id = md5(path)`` (32-hex string — stable across reruns and
    collision-safe at the ~1e9-file crawl scale where a 64-bit id
    birthday-merges distinct documents; see ``read_binary_files`` for the
    bound, and for why ids are NOT comparable across the two readers: this
    path comes from ``input_file_name()``, whose URI encoding differs from
    ``binaryFile``'s path column). ``pattern`` rides ``pathGlobFilter``
    (listing-level pruning). Each file must fit a task (wholetext reads a
    file as one row — the right contract for documents, not for
    concatenated shards; shard-per-line corpora use the default line mode
    + JSONL readers above)."""
    reader = spark.read.option("wholetext", "true")
    if pattern is not None:
        reader = reader.option("pathGlobFilter", pattern)
    raw = reader.text(path)
    pathcol = F.input_file_name()
    return raw.select(
        F.md5(pathcol.cast("binary")).alias("doc_id"),
        F.col("value").alias("text"),
        pathcol.alias("path"),
        F.length("value").alias("n_chars"),
    )

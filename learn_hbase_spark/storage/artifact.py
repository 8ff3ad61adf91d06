"""Crash-safe parquet-directory protocol, shared by every on-disk artifact.

Two subsystems maintain mutable multi-table parquet artifacts — the
WideTable secondary index (``widetable.py``: base + ``delta_*`` segment
stack) and the frozen ANN IVF-PQ index (``operators/similarity.py``:
cells/codes + ``_batch=`` delta partitions) — and both converged on the
same protocol:

- **tombstone-first metadata**: the validity marker is written LAST, so a
  torn write reads as absent/stale, never as a complete-looking artifact
  over mixed halves;
- **rename, not rmtree**: directory renames are atomic on file:/hdfs:
  where recursive deletes are not — supersede by renaming to a trash
  name, then delete the trash (safe at any interruption point);
- **committed-file-less dirs read as ABSENT**: an interrupted delete or
  an uncommitted write's ``_temporary`` remnant leaves a dir with no
  committed parquet files; reading it must behave as "absent", while any
  OTHER failure (corrupt footer, permissions) re-raises loudly;
- **Hadoop FS API for every move/delete**: local ``os``/``shutil`` calls
  silently no-op on ``hdfs://``/``s3a://`` URIs and would leave stale
  segments live under fresh metadata on a real cluster.

This module is the single implementation of those mechanics; the two
subsystems keep their own metadata formats and fold policies on top.
"""

from __future__ import annotations


def hadoop_path(spark, p: str):
    """``p`` as an ``org.apache.hadoop.fs.Path``."""
    return spark._jvm.org.apache.hadoop.fs.Path(p)


def hadoop_fs(spark, p: str):
    """(FileSystem, Path) for ``p`` through the Hadoop FS API, so
    artifact maintenance operations (clear, swap, trash) run against
    whatever filesystem the path's scheme names — file:, hdfs://, s3a://
    — instead of silently no-opping local deletes on cluster URIs."""
    jpath = hadoop_path(spark, p)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def fs_delete(spark, p: str) -> None:
    """Recursive delete through the Hadoop FS API; absent paths no-op."""
    fs, jp = hadoop_fs(spark, p)
    fs.delete(jp, True)


def fs_rename(spark, src: str, dst: str) -> None:
    """Atomic directory rename through the Hadoop FS API. Hadoop's
    ``rename`` reports failure by RETURNING false, not raising — check
    it, because a swallowed failed swap would fold the stale copy on the
    next resume. (Atomic on file:/hdfs:; object stores rename by copy —
    there, stage through the store's committer or a table format.)"""
    fs, jsrc = hadoop_fs(spark, src)
    if not fs.rename(jsrc, hadoop_path(spark, dst)):
        raise IOError(f"rename failed: {src} -> {dst}")


def try_parquet(spark, p: str):
    """The path's parquet frame, or None ONLY when the path is absent.
    Any other read failure (corrupt footer, permissions, transient store
    error) re-raises: swallowing it would make probes silently serve
    base-only results — the opposite of the loud-refusal posture the
    tombstone-first design enforces everywhere else."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(p)
        df.schema  # force resolution
        return df
    except AnalysisException as exc:
        msg = str(exc)
        # UNABLE_TO_INFER_SCHEMA = a dir with no committed parquet files:
        # an interrupted rmtree's empty shell, or an uncommitted write's
        # _temporary remnant. Both are semantically ABSENT (an
        # uncommitted streaming delta will be re-landed by the replay),
        # and raising here would make exactly the crash states the
        # fold/compact protocols resume from unrecoverable.
        if (
            "PATH_NOT_FOUND" in msg
            or "Path does not exist" in msg
            or "UNABLE_TO_INFER_SCHEMA" in msg
        ):
            return None
        raise


def delta_partition_count(spark, p: str, prefix: str = "_batch=") -> int:
    """Number of committed ``{prefix}*`` partitions under a delta table —
    a driver-side listing of one directory (O(partitions), bounded by the
    fold threshold, never the data files), through the Hadoop FS API so
    it counts correctly on cluster URIs."""
    fs, jp = hadoop_fs(spark, p)
    if not fs.exists(jp):
        return 0
    return sum(
        1
        for st in fs.listStatus(jp)
        if st.getPath().getName().startswith(prefix)
    )


def write_text_sidecar(spark, p: str, content: str) -> None:
    """Overwrite a tiny text sidecar file (stamps, ownership markers) —
    one Hadoop-FS create, no parquet machinery, readable in O(1) on the
    probe path."""
    fs, jp = hadoop_fs(spark, p)
    out = fs.create(jp, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def read_text_sidecar(spark, p: str) -> str | None:
    """The sidecar's text, or None if it doesn't exist."""
    fs, jp = hadoop_fs(spark, p)
    if not fs.exists(jp):
        return None
    stream = fs.open(jp)
    try:
        return str(
            spark._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        )
    finally:
        stream.close()


def swap_via_trash(spark, base: str, tmp: str, trash: str) -> None:
    """Install a fully-staged ``tmp`` copy as ``base``: rename base→trash
    then tmp→base. Directory RENAMES are atomic where rmtree is not — a
    crash mid-removal would leave a PARTIAL base that still reads as
    present, and a resume would fold the partial base over the only
    complete copy. With renames, base is either wholly present or wholly
    absent; when absent, the resume path renames the staged tmp in."""
    fs_delete(spark, trash)
    fs_rename(spark, base, trash)
    fs_rename(spark, tmp, base)


def sweep_trash(spark, parent: str, prefix: str) -> None:
    """Best-effort recursive delete of every ``{prefix}*`` child dir under
    ``parent`` — the final step of a fold, and the cleanup for trash left
    by EARLIER interrupted folds. Safe at any interruption point: trash
    contents are superseded the moment they were renamed in."""
    fs, jp = hadoop_fs(spark, parent)
    if not fs.exists(jp):
        return
    for st in fs.listStatus(jp):
        if st.isDirectory() and st.getPath().getName().startswith(prefix):
            fs.delete(st.getPath(), True)

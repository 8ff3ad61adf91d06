"""Shared storage-artifact plumbing (crash-safe parquet dir protocol)."""

from .artifact import (  # noqa: F401
    delta_partition_count,
    fs_delete,
    fs_rename,
    hadoop_fs,
    hadoop_path,
    read_text_sidecar,
    swap_via_trash,
    sweep_trash,
    try_parquet,
    write_text_sidecar,
)

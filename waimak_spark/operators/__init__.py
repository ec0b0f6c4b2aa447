from .cache import CacheAsParquetExtension, SparkCacheExtension
from .commit import (
    CommitEntry,
    CommitMetadataExtension,
    DataCommitter,
    ParquetDataCommitter,
    date_based_snapshot_cleanup,
)
from .manifest_commit import ManifestParquetDataCommitter, read_manifest_table

__all__ = [
    "CacheAsParquetExtension",
    "CommitEntry",
    "CommitMetadataExtension",
    "DataCommitter",
    "ManifestParquetDataCommitter",
    "ParquetDataCommitter",
    "SparkCacheExtension",
    "date_based_snapshot_cleanup",
    "read_manifest_table",
]

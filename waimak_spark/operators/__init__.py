from .cache import CacheAsParquetExtension, SparkCacheExtension
from .commit import (
    CommitEntry,
    CommitMetadataExtension,
    DataCommitter,
    ParquetDataCommitter,
    date_based_snapshot_cleanup,
)

__all__ = [
    "CacheAsParquetExtension",
    "CommitEntry",
    "CommitMetadataExtension",
    "DataCommitter",
    "ParquetDataCommitter",
    "SparkCacheExtension",
    "date_based_snapshot_cleanup",
]

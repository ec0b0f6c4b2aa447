"""Hot/cold audit storage layer: append-only regions on partitioned
Parquet with primary-key snapshot dedup, time-range reads, and compaction.

Re-expresses the reference's waimak-storage module
(waimak-storage/.../AuditTableFile.scala, StorageActions.scala,
FileStorageOps.scala, Storage.scala) Spark-first: the physical layout is
Hive-style partition directories so Catalyst prunes regions from plain
``.isin`` filters, and every kernel (append, allBetween, snapshot dedup,
compact) is an ordinary DataFrame plan.
"""

from .audit import (
    AuditTableFile,
    AuditTableInfo,
    AuditTableRegionInfo,
    StorageException,
    apply_changes,
)
from .file_ops import FileStorageOps
from .actions import (
    run_single_compaction_during_window,
    total_bytes_partitioner,
    total_cells_partitioner,
)

__all__ = [
    "apply_changes",
    "AuditTableFile",
    "AuditTableInfo",
    "AuditTableRegionInfo",
    "StorageException",
    "FileStorageOps",
    "run_single_compaction_during_window",
    "total_bytes_partitioner",
    "total_cells_partitioner",
]

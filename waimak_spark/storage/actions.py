"""Storage-layer flow actions, compaction partitioners and the compaction
window trigger.

Re-expresses waimak-storage/.../StorageActions.scala:19-323 — the action
surface (`get_or_create_audit_table`, `get_audit_table`, `write_to_storage`,
`snapshot_from_storage`, `load_from_storage`), the pluggable compaction
partitioners, and ``runSingleCompactionDuringWindow``.
"""

from __future__ import annotations

import math
import uuid
from datetime import datetime, timedelta
from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame

from ..dataflow.action import SimpleAction
from .audit import (
    COLD_PARTITION,
    HOT_PARTITION,
    AuditTableFile,
    AuditTableInfo,
    AuditTableRegionInfo,
    CompactionPartitioner,
    StorageException,
    get_or_create_tables,
)
from .file_ops import FileStorageOps

STORAGE_PARAM_PREFIX = "spark.waimak.storage"
TRASH_MAX_AGE_MS = f"{STORAGE_PARAM_PREFIX}.trashMaxAgeMs"
TRASH_MAX_AGE_MS_DEFAULT = 86_400_000
SMALL_REGION_ROW_THRESHOLD = f"{STORAGE_PARAM_PREFIX}.smallRegionRowThreshold"
SMALL_REGION_ROW_THRESHOLD_DEFAULT = 50_000_000
COMPACTION_PARTITIONER_IMPLEMENTATION = (
    f"{STORAGE_PARAM_PREFIX}.compactionPartitionerImplementation")
COMPACTION_PARTITIONER_IMPLEMENTATION_DEFAULT = "bytes"
BYTES_PER_PARTITION = f"{STORAGE_PARAM_PREFIX}.bytesPerPartition"
BYTES_PER_PARTITION_DEFAULT = 250_000_000
CELLS_PER_PARTITION = f"{STORAGE_PARAM_PREFIX}.cellsPerPartition"
CELLS_PER_PARTITION_DEFAULT = 2_500_000
RECOMPACT_ALL = f"{STORAGE_PARAM_PREFIX}.recompactAll"
RECOMPACT_ALL_DEFAULT = False
UPDATE_TABLE_METADATA = f"{STORAGE_PARAM_PREFIX}.updateMetadata"
UPDATE_TABLE_METADATA_DEFAULT = False

# (regions, appended count, compaction datetime) -> should compact?
CompactionDecision = Callable[[list[AuditTableRegionInfo], int, datetime], bool]


# ---------------------------------------------------------------------------
# compaction partitioners (StorageActions.scala:286-323)
# ---------------------------------------------------------------------------


def total_bytes_partitioner(
        bytes_per_partition: int = BYTES_PER_PARTITION_DEFAULT
) -> CompactionPartitioner:
    """Size the compacted region by the ON-DISK bytes of the input regions.

    The reference samples ≤1000 rows and runs ``SizeEstimator`` over the
    JVM row objects (StorageActions.scala:294-303); since the compaction
    output is Parquet again, the actual Parquet bytes of the inputs are a
    better predictor of output size — and cost a filesystem stat instead
    of a Spark job. The input bytes are handed to the partitioner by
    ``compact`` alongside the row count.
    """

    def partitioner(_df: DataFrame, _num_rows: int, total_bytes: int) -> int:
        return max(1, math.ceil(total_bytes / bytes_per_partition))

    return partitioner


def total_cells_partitioner(
        cells_per_partition: int = CELLS_PER_PARTITION_DEFAULT
) -> CompactionPartitioner:
    """ceil(rows × columns / cells_per_partition)
    (StorageActions.scala:312-323)."""

    def partitioner(df: DataFrame, num_rows: int, _total_bytes: int) -> int:
        return max(1, math.ceil(num_rows * len(df.schema) / cells_per_partition))

    return partitioner


#: registry replaces the reference's reflection-based loading
#: (StorageActions.scala:269-280)
PARTITIONER_REGISTRY: dict[str, Callable[..., CompactionPartitioner]] = {
    "bytes": total_bytes_partitioner,
    "cells": total_cells_partitioner,
}


def compaction_partitioner_from_context(context) -> CompactionPartitioner:
    name = context.get_string(COMPACTION_PARTITIONER_IMPLEMENTATION,
                              COMPACTION_PARTITIONER_IMPLEMENTATION_DEFAULT)
    if name not in PARTITIONER_REGISTRY:
        raise StorageException(
            f"Unknown compaction partitioner [{name}]; "
            f"registered: {sorted(PARTITIONER_REGISTRY)}")
    if name == "bytes":
        return total_bytes_partitioner(
            context.get_long(BYTES_PER_PARTITION, BYTES_PER_PARTITION_DEFAULT))
    return total_cells_partitioner(
        context.get_long(CELLS_PER_PARTITION, CELLS_PER_PARTITION_DEFAULT))


# ---------------------------------------------------------------------------
# compaction window trigger (StorageActions.scala:91-121)
# ---------------------------------------------------------------------------


def run_single_compaction_during_window(window_start_hours: int,
                                        window_end_hours: int
                                        ) -> CompactionDecision:
    """Compact iff: now is inside the [start, end) hour window (which may
    span midnight), hot regions exist, and no cold region was already
    created inside this window."""

    def decision(regions: list[AuditTableRegionInfo], _count: int,
                 now: datetime) -> bool:
        maybe_end = now.replace(hour=window_end_hours, minute=0, second=0,
                                microsecond=0)
        end = maybe_end + timedelta(days=1) if maybe_end < now else maybe_end
        maybe_start = end.replace(hour=window_start_hours)
        start = maybe_start - timedelta(days=1) if maybe_start > end else maybe_start
        hot_exists = any(r.store_type == HOT_PARTITION for r in regions)
        colds = sorted(
            (r.created_on for r in regions
             if r.store_type == COLD_PARTITION and r.created_on is not None),
            reverse=True)
        latest_cold = colds[0] if colds else None
        if now < start:
            return False
        if not hot_exists:
            return False
        if latest_cold is not None and start <= latest_cold <= end:
            return False
        return True

    return decision


# ---------------------------------------------------------------------------
# flow actions (StorageActions.scala:123-261)
# ---------------------------------------------------------------------------


def get_or_create_audit_table(flow, storage_base_path: str,
                              metadata_retrieval: Optional[
                                  Callable[[str], AuditTableInfo]] = None,
                              label_prefix: Optional[str] = "audittable",
                              include_hot: bool = True,
                              update_table_metadata: Optional[bool] = None,
                              table_names: Sequence[str] = ()):
    """Open (or create, given a metadata function) audit tables and put the
    :class:`AuditTableFile` handles on the flow as entities — one label per
    table (StorageActions.scala:145-157)."""
    labels = [f"{label_prefix}_{t}" if label_prefix else t for t in table_names]

    def body(_i, c):
        update = (update_table_metadata if update_table_metadata is not None
                  else c.get_boolean(UPDATE_TABLE_METADATA,
                                     UPDATE_TABLE_METADATA_DEFAULT))
        ops = FileStorageOps(c.spark, storage_base_path)
        return get_or_create_tables(ops, list(table_names), metadata_retrieval,
                                    update, include_hot)

    return flow.add_action(
        SimpleAction([], labels, body, name="getOrCreateAuditTable"))


def get_audit_table(flow, storage_base_path: str,
                    label_prefix: Optional[str] = "audittable",
                    include_hot: bool = True,
                    table_names: Sequence[str] = ()):
    """Open-only variant; fails on missing tables
    (StorageActions.scala:171-174)."""
    return get_or_create_audit_table(
        flow, storage_base_path, None, label_prefix, include_hot,
        update_table_metadata=False, table_names=table_names)


def write_to_storage(flow, label_name: str, last_updated_col: str,
                     append_dt: Optional[datetime] = None,
                     do_compaction: CompactionDecision = lambda r, c, t: False,
                     audit_table_label_prefix: str = "audittable"):
    """Append a labelled Dataset to its opened audit table; optionally
    compact afterwards per the decision lambda
    (StorageActions.scala:191-210, Storage.writeToFileTable)."""
    audit_label = f"{audit_table_label_prefix}_{label_name}"

    def body(i, c):
        table: AuditTableFile = i.get(audit_label)
        to_append: DataFrame = i.get(label_name)
        ts = append_dt or datetime.utcnow()
        new_table, count = table.append(to_append, last_updated_col, ts)
        recompact_all = c.get_boolean(RECOMPACT_ALL, RECOMPACT_ALL_DEFAULT)
        if recompact_all or do_compaction(new_table.regions, count, ts):
            new_table.compact(
                compact_ts=ts,
                trash_max_age_ms=c.get_long(TRASH_MAX_AGE_MS,
                                            TRASH_MAX_AGE_MS_DEFAULT),
                small_region_row_threshold=c.get_long(
                    SMALL_REGION_ROW_THRESHOLD,
                    SMALL_REGION_ROW_THRESHOLD_DEFAULT),
                compaction_partitioner=compaction_partitioner_from_context(c),
                recompact_all=recompact_all,
            )
        return []

    return flow.add_action(
        SimpleAction([label_name, audit_label], [], body, name="writeToStorage"))


def snapshot_from_storage(flow, storage_base_path: str, snapshot_ts,
                          include_hot: bool = True,
                          output_prefix: Optional[str] = None,
                          table_names: Sequence[str] = ()):
    """Deduplicated snapshot of each table at ``snapshot_ts``
    (StorageActions.scala:224-235)."""
    rand = uuid.uuid4().hex[:8]
    flow = get_audit_table(flow, storage_base_path, f"snap_{rand}",
                           include_hot, table_names)
    for t in table_names:
        audit_label = f"snap_{rand}_{t}"
        out = f"{output_prefix}_{t}" if output_prefix else t

        def body(i, _c, audit_label=audit_label):
            return [i.get(audit_label).snapshot(snapshot_ts)]

        flow = flow.add_action(
            SimpleAction([audit_label], [out], body, name="snapshotFromStorage"))
    return flow


def load_from_storage(flow, storage_base_path: str, from_ts=None, to_ts=None,
                      include_hot: bool = True,
                      output_prefix: Optional[str] = None,
                      table_names: Sequence[str] = ()):
    """All events between the two timestamps per table — history, not a
    snapshot (StorageActions.scala:249-259)."""
    rand = uuid.uuid4().hex[:8]
    flow = get_audit_table(flow, storage_base_path, f"load_{rand}",
                           include_hot, table_names)
    for t in table_names:
        audit_label = f"load_{rand}_{t}"
        out = f"{output_prefix}_{t}" if output_prefix else t

        def body(i, _c, audit_label=audit_label):
            return [i.get(audit_label).all_between(from_ts, to_ts)]

        flow = flow.add_action(
            SimpleAction([audit_label], [out], body, name="loadFromStorage"))
    return flow

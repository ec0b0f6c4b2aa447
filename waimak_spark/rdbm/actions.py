"""RDBM ingestion flow actions (RDBMIngestionActions.scala:30-140):
extraction composes with the storage layer — open/create the audit table,
extract the delta from the watermark, append to storage, optionally
compact; temporal tables get the delete-detecting snapshot."""

from __future__ import annotations

import uuid
from datetime import datetime
from typing import Callable, Optional, Sequence

from dataclasses import dataclass

from ..dataflow.action import SimpleAction  # noqa: F401  (re-export site)
from ..storage.actions import write_to_storage
from .extractor import RDBMExtractor
from .kernels import snapshot_temporal_table_dataset
from .sqlgen import SQLServerTemporalTableMetadata


@dataclass(frozen=True)
class RDBMExtractionTableConfig:
    """Per-table extraction config (RDBMIngestionUtils.scala bottom)."""

    table_name: str
    pk_cols: Optional[Sequence[str]] = None
    last_updated_column: Optional[str] = None
    max_rows_per_partition: Optional[int] = None
    force_retain_storage_history: Optional[bool] = None


def extract_from_rdbm(flow, extractor: RDBMExtractor,
                      last_updated_offset: int, label: str,
                      audit_table_label_prefix: str,
                      table_config: RDBMExtractionTableConfig,
                      force_full_load: bool = False):
    """Incremental JDBC read from the audit table's watermark minus the
    safety offset (RDBMIngestionActions.scala:80-104)."""
    audit_label = f"{audit_table_label_prefix}_{label}"

    def body(i, _c):
        table = i.get(audit_label)
        latest = table.get_latest_timestamp()
        from .sqlgen import resolve_last_updated

        last_updated = resolve_last_updated(
            latest, last_updated_offset, extractor.last_updated_lower_bound)
        return [extractor.get_table_dataset(
            table.meta, last_updated, table_config.max_rows_per_partition,
            force_full_load)]

    return flow.add_action(
        SimpleAction([audit_label], [label], body, name="extractFromRDBM"))


def extract_to_storage_from_rdbm(flow, extractor: RDBMExtractor,
                                 db_schema: str, storage_base_path: str,
                                 table_configs: dict[str, RDBMExtractionTableConfig],
                                 extract_dt: Optional[datetime] = None,
                                 last_updated_offset: int = 0,
                                 force_full_load: bool = False,
                                 do_compaction: Callable = lambda r, c, t: False,
                                 table_names: Sequence[str] = ()):
    """Composite per-table chain: getOrCreate → extract → writeToStorage
    (RDBMIngestionActions.scala:41-65)."""
    from ..storage.actions import get_or_create_audit_table

    def metadata_fn(table_name: str):
        cfg = table_configs[table_name]
        return extractor.get_table_metadata(
            db_schema, table_name, cfg.pk_cols, cfg.last_updated_column,
            cfg.force_retain_storage_history)

    rand = uuid.uuid4().hex[:8]
    flow = get_or_create_audit_table(
        flow, storage_base_path, metadata_fn, f"rdbm_{rand}", True,
        None, table_names)
    for t in table_names:
        flow = extract_from_rdbm(flow, extractor, last_updated_offset, t,
                                 f"rdbm_{rand}", table_configs[t],
                                 force_full_load)
        flow = write_to_storage(flow, t,
                                extractor.rdbm_record_last_updated_column,
                                extract_dt, do_compaction, f"rdbm_{rand}")
    return flow


def snapshot_temporal_tables_from_storage(flow, storage_base_path: str,
                                          snapshot_ts,
                                          table_names: Sequence[str] = ()):
    """Temporal-aware snapshot: plain ``snapshot`` for non-temporal
    tables, the delete-detecting kernel over ``allBetween`` for temporal
    ones (RDBMIngestionActions.scala:120-139)."""
    from ..storage.actions import get_audit_table

    rand = uuid.uuid4().hex[:8]
    flow = get_audit_table(flow, storage_base_path, f"temporal_{rand}", True,
                           table_names)
    for t in table_names:
        audit_label = f"temporal_{rand}_{t}"

        def body(i, _c, audit_label=audit_label):
            table = i.get(audit_label)
            meta = SQLServerTemporalTableMetadata(
                schema_name=table.meta.get("schemaName", ""),
                table_name=table.meta.get("tableName", table.table_name),
                pk_cols=[c for c in table.meta.get("pkCols", "").split(";") if c],
                history_table_schema=table.meta.get("historyTableSchema"),
                history_table_name=table.meta.get("historyTableName"),
                start_col_name=table.meta.get("startColName"),
                end_col_name=table.meta.get("endColName"),
            )
            if not meta.is_temporal:
                return [table.snapshot(snapshot_ts)]
            return [snapshot_temporal_table_dataset(
                table.all_between(None, snapshot_ts), snapshot_ts, meta)]

        flow = flow.add_action(
            SimpleAction([audit_label], [t], body,
                         name="snapshotTemporalTablesFromStorage"))
    return flow

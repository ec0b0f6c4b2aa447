"""Pure SQL-string builders for incremental RDBM extraction — the exact
query shapes the reference pushes down over JDBC, testable without any
database.

Reference provenance:
* incremental select:      RDBMExtractor.scala:187-205
* split-predicate queries: RDBMExtractor.scala:241-288
* temporal delta (SQL Server ``FOR SYSTEM_TIME``):
                           SQLServerTemporalExtractor.scala:150-205
* PK discovery queries:    PostgresExtractor.scala:32-54,
                           SQLServerExtractor.scala:31-64
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

SYSTEM_TIMESTAMP_COLUMN = "system_timestamp_of_extraction"
RDBM_RECORD_LAST_UPDATED_COLUMN = "rdbm_record_last_updated"
SOURCE_TYPE_COLUMN = "source_type"  # 0 = live row, 1 = history row

LOWER_DATE_BOUND = "1900-01-01"
UPPER_DATE_BOUND = "9999-12-31"
DEFAULT_UPPER_TIMESTAMP = "9999-12-31 23:59:59"
# SQL Server ``datetime`` cannot represent values before 1900-01-01; a
# watermark below that must be clamped (SQLServerBaseExtractor semantics)
SQLSERVER_DATETIME_LOWER_BOUND = "1900-01-01 00:00:00"

Escape = Callable[[str], str]


def escape_postgres(identifier: str) -> str:
    return f'"{identifier}"'


def escape_sqlserver(identifier: str) -> str:
    return f"[{identifier}]"


@dataclass(frozen=True)
class TableExtractionMetadata:
    """Metadata required to extract one table (TableExtractionMetadata in
    RDBMIngestionUtils.scala)."""

    schema_name: str
    table_name: str
    pk_cols: Sequence[str]
    last_updated_column: Optional[str] = None

    def qualified_table_name(self, escape: Escape) -> str:
        return f"{escape(self.schema_name)}.{escape(self.table_name)}"

    def to_meta(self) -> dict[str, str]:
        m = {
            "schemaName": self.schema_name,
            "tableName": self.table_name,
            "pkCols": ";".join(self.pk_cols),
        }
        if self.last_updated_column:
            m["lastUpdatedColumn"] = self.last_updated_column
        return m

    @staticmethod
    def from_meta(m: dict[str, str]) -> "TableExtractionMetadata":
        return TableExtractionMetadata(
            schema_name=m["schemaName"],
            table_name=m["tableName"],
            pk_cols=[c for c in m.get("pkCols", "").split(";") if c],
            last_updated_column=m.get("lastUpdatedColumn") or None,
        )


@dataclass(frozen=True)
class SQLServerTemporalTableMetadata:
    """Metadata for a (possibly) temporal SQL Server table
    (SQLServerTemporalTableMetadata; period columns discovered from
    sys.periods per SQLServerTemporalExtractor.scala:42-74)."""

    schema_name: str
    table_name: str
    pk_cols: Sequence[str] = field(default_factory=list)
    last_updated_column: Optional[str] = None
    history_table_schema: Optional[str] = None
    history_table_name: Optional[str] = None
    start_col_name: Optional[str] = None
    end_col_name: Optional[str] = None
    database_upper_timestamp: Optional[str] = None

    @property
    def is_temporal(self) -> bool:
        return bool(self.history_table_name and self.start_col_name
                    and self.end_col_name)

    def qualified_table_name(self, escape: Escape) -> str:
        return f"{escape(self.schema_name)}.{escape(self.table_name)}"


# ---------------------------------------------------------------------------
# incremental select (RDBMExtractor.scala:187-205)
# ---------------------------------------------------------------------------


def from_query_part(meta: TableExtractionMetadata,
                    last_updated: Optional[str], escape: Escape) -> str:
    """``from schema.table [where lastUpdatedCol > 'ts']``."""
    if meta.last_updated_column and last_updated:
        return (f"from {meta.qualified_table_name(escape)} "
                f"where {escape(meta.last_updated_column)} > '{last_updated}'")
    return f"from {meta.qualified_table_name(escape)}"


def select_query(meta: TableExtractionMetadata, last_updated: Optional[str],
                 explicit_column_selects: Sequence[str],
                 system_timestamp_function: str, escape: Escape) -> str:
    """The JDBC subquery: ``(select *, <explicit>, <now()> as
    system_timestamp_of_extraction from … [where …]) s``."""
    extra = ",".join(
        list(explicit_column_selects)
        + [f"{system_timestamp_function} as {SYSTEM_TIMESTAMP_COLUMN}"])
    return f"(select *, {extra} {from_query_part(meta, last_updated, escape)}) s"


# ---------------------------------------------------------------------------
# split-predicate partitioning (RDBMExtractor.scala:241-288)
# ---------------------------------------------------------------------------


def split_point_col(meta: TableExtractionMetadata, escape: Escape) -> str:
    """Single PK column, or ``CONCAT(pk1,'-',pk2,…)`` for composite keys."""
    if len(meta.pk_cols) > 1:
        return "CONCAT(" + ",'-',".join(escape(c) for c in meta.pk_cols) + ")"
    return escape(meta.pk_cols[0])


def split_points_query(meta: TableExtractionMetadata,
                       last_updated: Optional[str],
                       max_rows_per_partition: int, escape: Escape) -> str:
    """Boundary-point query: every ``max_rows_per_partition``-th PK in
    order, via ``row_number() % N = 0`` — pushed down so only the split
    points travel back."""
    pks = ",".join(escape(c) for c in meta.pk_cols)
    # _row_num is exposed so the CLIENT can sort the points into PK order:
    # row_number() orders only the window computation, not the result rows
    # (parallel scans return derived-table rows in any order), and an
    # ORDER BY here would be rejected by SQL Server inside a derived
    # table. Unordered points would make split_points_to_predicates build
    # overlapping ranges that silently duplicate rows.
    return (
        "(\n"
        "select split_point, _row_num from (\n"
        f"select {split_point_col(meta, escape)} as split_point, "
        f"row_number() over (order by {pks}) as _row_num\n"
        f"{from_query_part(meta, last_updated, escape)}\n"
        f") ids where _row_num % {max_rows_per_partition} = 0) s"
    )


def split_points_to_predicates(split_points: Sequence[str],
                               meta: TableExtractionMetadata,
                               escape: Escape) -> Optional[list[str]]:
    """[a,b,c] → ["pk >= 'a' and pk < 'b'", "pk >= 'b' and pk < 'c'",
    "pk < 'a'", "pk >= 'c'"] — one JDBC partition each; None when the
    table fits in a single partition."""
    if not split_points:
        return None
    col = split_point_col(meta, escape)
    mains = [
        f"{col} >= '{a}' and {col} < '{b}'"
        for a, b in zip(split_points, split_points[1:])
    ]
    endpoints = [f"{col} < '{split_points[0]}'",
                 f"{col} >= '{split_points[-1]}'"]
    return mains + endpoints


# ---------------------------------------------------------------------------
# SQL Server temporal tables (SQLServerTemporalExtractor.scala:150-205)
# ---------------------------------------------------------------------------


def _upper_ts(meta: SQLServerTemporalTableMetadata) -> str:
    return f"'{meta.database_upper_timestamp or DEFAULT_UPPER_TIMESTAMP}'"


def temporal_from_query_part(meta: SQLServerTemporalTableMetadata,
                             last_updated: Optional[str],
                             escape: Escape) -> str:
    """Delta: ``FOR SYSTEM_TIME from 'ts' to '9999-12-31'`` restricted to
    rows whose validity changed after ``ts``; full history when no
    watermark; plain ``from`` for non-temporal tables."""
    if meta.is_temporal and last_updated:
        start, end = meta.start_col_name, meta.end_col_name
        return (
            f"from {meta.qualified_table_name(escape)}\n"
            f"for SYSTEM_TIME from '{last_updated}' to '{UPPER_DATE_BOUND}'\n"
            f"where ({escape(end)} < {_upper_ts(meta)} "
            f"and {escape(end)} >= '{last_updated}')\n"
            f"or {escape(start)} >= '{last_updated}'"
        )
    if meta.is_temporal:
        return (f"from {meta.qualified_table_name(escape)}\n"
                f"for SYSTEM_TIME from '{LOWER_DATE_BOUND}' "
                f"to '{UPPER_DATE_BOUND}'")
    return f"from {meta.qualified_table_name(escape)}"


def _source_type_select(meta: SQLServerTemporalTableMetadata,
                        escape: Escape) -> str:
    """0 for the live row (open validity), 1 for history rows."""
    return (f"{SOURCE_TYPE_COLUMN} = case when {escape(meta.end_col_name)} = "
            f"{_upper_ts(meta)} then 0 else 1 end")


def temporal_select_query(meta: SQLServerTemporalTableMetadata,
                          last_updated: Optional[str],
                          explicit_column_selects: Sequence[str],
                          system_timestamp_function: str,
                          escape: Escape) -> str:
    """Temporal subquery: adds ``source_type`` and — only when the table
    has no last-updated column — the extraction timestamp."""
    selects = list(explicit_column_selects)
    if not meta.last_updated_column:
        selects.append(
            f"{system_timestamp_function} as {SYSTEM_TIMESTAMP_COLUMN}")
    if meta.end_col_name:
        selects.append(_source_type_select(meta, escape))
    extra = ", " + ",".join(selects) if selects else ""
    return (f"(select * {extra} "
            f"{temporal_from_query_part(meta, last_updated, escape)}) s")


# ---------------------------------------------------------------------------
# PK discovery (PostgresExtractor.scala:32-54, SQLServerExtractor.scala:31-64)
# ---------------------------------------------------------------------------

POSTGRES_PK_QUERY = """(
select
   n.nspname as schemaName,
   t.relname as tableName,
   STRING_AGG(a.attname, ';') as pkCols
from     pg_class t,
    pg_class i,
    pg_index ix,
    pg_namespace n,
    pg_attribute a
where
    t.oid = ix.indrelid
    and i.oid = ix.indexrelid
    and n.oid = t.relnamespace
    and ix.indisprimary
    and a.attrelid = t.oid
    and a.attnum = ANY(ix.indkey)
group by n.nspname, t.relname
) s"""

SQLSERVER_PK_QUERY = """(
SELECT p1.schemaName, p1.tableName,
stuff( (SELECT ';'+primaryKeys
\tFROM (
\t\tSELECT SCHEMA_NAME(main.schema_id) as schemaName,
\t\tmain.name AS tableName,
\t\ttc.name as primarykeys
\t\tFROM sys.tables main
\t\tinner join sys.indexes i on main.object_id = i.object_id
\t\tinner join sys.index_columns ic on i.object_id = ic.object_id and i.index_id = ic.index_id
\t\tinner join sys.columns tc on ic.object_id = tc.object_id and ic.column_id = tc.column_id
\t\twhere i.is_primary_key = 1
\t\tgroup by main.schema_id,
\t\tmain.name,
\t\ttc.name) p2
\tWHERE p2.tablename = p1.tablename
\tORDER BY primaryKeys
 FOR XML PATH(''), TYPE).value('.', 'varchar(max)') ,1,1,'') AS primaryKeys
FROM (
\tSELECT SCHEMA_NAME(main.schema_id) as schemaName,
\tmain.name AS tableName,
\ttc.name as primarykeys
\tFROM sys.tables main
\tinner join sys.indexes i on main.object_id = i.object_id
\tinner join sys.index_columns ic on i.object_id = ic.object_id and i.index_id = ic.index_id
\tinner join sys.columns tc on ic.object_id = tc.object_id and ic.column_id = tc.column_id
\twhere i.is_primary_key = 1
\tgroup by main.schema_id,
\tmain.name,
\ttc.name) p1
GROUP BY schemaName,
tableName) m"""

# history table + period (start/end) column discovery for temporal tables
# (SQLServerTemporalExtractor.scala:42-74, sys.periods join)
SQLSERVER_TEMPORAL_METADATA_QUERY = """(
select s.name as schemaName, t.name as tableName,
       hs.name as historyTableSchema, ht.name as historyTableName,
       scol.name as startColName, ecol.name as endColName
from sys.tables t
join sys.schemas s on t.schema_id = s.schema_id
left join sys.tables ht on t.history_table_id = ht.object_id
left join sys.schemas hs on ht.schema_id = hs.schema_id
left join sys.periods p on t.object_id = p.object_id
left join sys.columns scol on p.object_id = scol.object_id and p.start_column_id = scol.column_id
left join sys.columns ecol on p.object_id = ecol.object_id and p.end_column_id = ecol.column_id
) m"""


# ---------------------------------------------------------------------------
# watermark resolution (RDBMIngestionActions.scala:89-101)
# ---------------------------------------------------------------------------


def resolve_last_updated(latest, offset_seconds: int,
                         clamp_lower: Optional[str] = None):
    """Next delta watermark = table's max last-updated minus a safety
    offset, optionally clamped to the column type's representable range
    (SQL Server ``datetime`` → 1900-01-01)."""
    from datetime import datetime, timedelta

    if latest is None:
        return None
    if isinstance(latest, datetime):
        out = latest - timedelta(seconds=offset_seconds)
        if clamp_lower is not None:
            lower = datetime.fromisoformat(clamp_lower.replace(" ", "T"))
            if out < lower:
                out = lower
        return out
    return latest - offset_seconds

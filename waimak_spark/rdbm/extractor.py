"""RDBM extractors: dialect objects that compose the pushdown SQL from
``sqlgen`` and load it with ``spark.read.jdbc`` — each split predicate
becomes one Dataset partition opening its own JDBC connection on an
executor (RDBMExtractor.scala:212-228).

No JDBC driver ships in this environment, so the network boundary is kept
to two small methods (``_read_jdbc``, ``_read_jdbc_query``) that tests
stub with in-memory frames; everything else — metadata resolution, PK
validation, SQL generation, predicate construction — is exercised as-is.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .kernels import lower_case_all
from .sqlgen import (
    POSTGRES_PK_QUERY,
    RDBM_RECORD_LAST_UPDATED_COLUMN,
    SQLSERVER_DATETIME_LOWER_BOUND,
    SQLSERVER_PK_QUERY,
    SQLSERVER_TEMPORAL_METADATA_QUERY,
    SYSTEM_TIMESTAMP_COLUMN,
    SQLServerTemporalTableMetadata,
    TableExtractionMetadata,
    escape_postgres,
    escape_sqlserver,
    resolve_last_updated,
    select_query,
    split_points_query,
    split_points_to_predicates,
    temporal_select_query,
)


class IncorrectUserPKException(Exception):
    def __init__(self, user_pks: Sequence[str], db_pks: Sequence[str]):
        super().__init__(
            "User-provided primary keys did not match those found in the "
            f"database. User provided: {','.join(user_pks)} "
            f"From DB: {','.join(db_pks)}")


class PKsNotFoundOrProvidedException(Exception):
    def __init__(self):
        super().__init__("PK cannot be found in the database so must be provided")


class RDBMExtractor:
    """Base extractor (RDBMExtractor.scala:80-288)."""

    driver_class: str = ""
    system_timestamp_function: str = "CURRENT_TIMESTAMP"
    #: clamp watermarks below this (dialects with bounded datetime ranges)
    last_updated_lower_bound: Optional[str] = None
    rdbm_record_last_updated_column = RDBM_RECORD_LAST_UPDATED_COLUMN

    def __init__(self, spark: SparkSession, jdbc_url: str,
                 connection_properties: Optional[dict[str, str]] = None):
        self.spark = spark
        self.jdbc_url = jdbc_url
        self.connection_properties = dict(connection_properties or {})

    # -- dialect hooks ---------------------------------------------------------
    def escape_keyword(self, identifier: str) -> str:
        raise NotImplementedError

    def table_pks(self, schema: str, table: str) -> Optional[list[str]]:
        """PKs from the dialect's metadata query; None if undiscoverable."""
        raise NotImplementedError

    # -- JDBC boundary (stubbed in tests) --------------------------------------
    def _read_jdbc(self, table_or_query: str,
                   predicates: Optional[list[str]] = None) -> DataFrame:
        reader = (self.spark.read.format("jdbc")
                  .option("url", self.jdbc_url)
                  .option("dbtable", table_or_query)
                  .option("driver", self.driver_class))
        for k, v in self.connection_properties.items():
            reader = reader.option(k, v)
        if predicates:
            # predicate-partitioned read: one partition per predicate
            return self.spark.read.jdbc(
                self.jdbc_url, table_or_query, predicates=list(predicates),
                properties={**self.connection_properties,
                            "driver": self.driver_class})
        return reader.load()

    def _read_jdbc_query(self, query: str) -> DataFrame:
        return self._read_jdbc(query)

    # -- metadata (PostgresExtractor.scala:68-85 pattern) ----------------------
    def get_table_metadata(self, db_schema: str, table_name: str,
                           primary_keys: Optional[Sequence[str]],
                           last_updated_column: Optional[str],
                           retain_storage_history=None):
        """Resolve + validate PKs and build the AuditTableInfo whose meta
        carries the extraction metadata."""
        from ..storage import AuditTableInfo

        db_pks = self.table_pks(db_schema, table_name)
        if primary_keys and db_pks and sorted(primary_keys) != sorted(db_pks):
            raise IncorrectUserPKException(primary_keys, db_pks)
        pks = list(primary_keys or db_pks or [])
        if not pks:
            raise PKsNotFoundOrProvidedException()
        meta = TableExtractionMetadata(db_schema, table_name, pks,
                                       last_updated_column)
        if retain_storage_history is None:
            # default: retain history iff we can do incremental loads
            retain = meta.last_updated_column is not None
        elif callable(retain_storage_history):
            retain = retain_storage_history(meta.last_updated_column)
        else:
            retain = bool(retain_storage_history)
        return AuditTableInfo(table_name, pks, meta.to_meta(), retain)

    # -- extraction (RDBMExtractor.scala:150-228) ------------------------------
    def select_query(self, meta: TableExtractionMetadata,
                     last_updated: Optional[str],
                     explicit_column_selects: Sequence[str] = ()) -> str:
        return select_query(meta, last_updated, explicit_column_selects,
                            self.system_timestamp_function,
                            self.escape_keyword)

    def resolve_last_updated_column(self, meta: TableExtractionMetadata):
        """The column stamped as ``rdbm_record_last_updated``: the table's
        own last-updated column, else the extraction timestamp."""
        return F.col(meta.last_updated_column or SYSTEM_TIMESTAMP_COLUMN)

    def constrain_last_updated(self, ts):
        return resolve_last_updated(ts, 0, self.last_updated_lower_bound)

    def generate_split_predicates(self, meta: TableExtractionMetadata,
                                  last_updated: Optional[str],
                                  max_rows_per_partition: int
                                  ) -> Optional[list[str]]:
        q = split_points_query(meta, last_updated, max_rows_per_partition,
                               self.escape_keyword)
        # Sort by the DB-computed _row_num, NOT the stringified point:
        # derived-table row order is engine-dependent (parallel scans), and
        # lexicographic re-sorting of stringified numeric PKs (5,9,10 ->
        # '10','5','9') would both produce overlapping predicates that
        # silently duplicate rows. _row_num is the PK rank in the DB's own
        # collation (RDBMExtractor.scala:247-253).
        rows = self._read_jdbc_query(q).collect()
        points = [str(r[0]) for r in sorted(rows, key=lambda r: r[1])]
        return split_points_to_predicates(points, meta,
                                          self.escape_keyword)

    def get_table_dataset(self, meta_map: dict[str, str],
                          last_updated=None,
                          max_rows_per_partition: Optional[int] = None,
                          force_full_load: bool = False) -> DataFrame:
        """Incremental (or full) extraction stamped with
        ``rdbm_record_last_updated`` (RDBMExtractor.scala:169-176)."""
        meta = TableExtractionMetadata.from_meta(meta_map)
        lu = None if force_full_load else (
            str(last_updated) if last_updated is not None else None)
        query = self.select_query(meta, lu)
        predicates = None
        if max_rows_per_partition:
            predicates = self.generate_split_predicates(
                meta, lu, max_rows_per_partition)
        df = self._read_jdbc(query, predicates)
        return df.withColumn(self.rdbm_record_last_updated_column,
                             self.resolve_last_updated_column(meta))


class PostgresExtractor(RDBMExtractor):
    driver_class = "org.postgresql.Driver"

    def escape_keyword(self, identifier: str) -> str:
        return escape_postgres(identifier)

    def table_pks(self, schema: str, table: str) -> Optional[list[str]]:
        df = lower_case_all(self._read_jdbc_query(POSTGRES_PK_QUERY))
        for row in df.collect():
            if (row["schemaName"] == schema.lower()
                    and row["tableName"] == table.lower()):
                return row["pkCols"].split(";")
        return None


class SQLServerExtractor(RDBMExtractor):
    driver_class = "com.microsoft.sqlserver.jdbc.SQLServerDriver"
    system_timestamp_function = "CURRENT_TIMESTAMP"
    last_updated_lower_bound = SQLSERVER_DATETIME_LOWER_BOUND

    def escape_keyword(self, identifier: str) -> str:
        return escape_sqlserver(identifier)

    def table_pks(self, schema: str, table: str) -> Optional[list[str]]:
        df = lower_case_all(self._read_jdbc_query(SQLSERVER_PK_QUERY))
        for row in df.collect():
            if (row["schemaName"] == schema.lower()
                    and row["tableName"] == table.lower()):
                return row["primaryKeys"].split(";")
        return None


class SQLServerTemporalExtractor(SQLServerExtractor):
    """Adds ``FOR SYSTEM_TIME`` history extraction and ``source_type``
    stamping (SQLServerTemporalExtractor.scala)."""

    def get_temporal_metadata(
            self, schema: str, table: str) -> SQLServerTemporalTableMetadata:
        df = self._read_jdbc_query(SQLSERVER_TEMPORAL_METADATA_QUERY)
        for row in df.collect():
            if (str(row["schemaName"]).lower() == schema.lower()
                    and str(row["tableName"]).lower() == table.lower()):
                return SQLServerTemporalTableMetadata(
                    schema_name=schema, table_name=table,
                    history_table_schema=row["historyTableSchema"],
                    history_table_name=row["historyTableName"],
                    start_col_name=row["startColName"],
                    end_col_name=row["endColName"])
        return SQLServerTemporalTableMetadata(schema, table)

    def temporal_select_query(self, meta: SQLServerTemporalTableMetadata,
                              last_updated: Optional[str],
                              explicit_column_selects: Sequence[str] = ()
                              ) -> str:
        return temporal_select_query(meta, last_updated,
                                     explicit_column_selects,
                                     self.system_timestamp_function,
                                     self.escape_keyword)

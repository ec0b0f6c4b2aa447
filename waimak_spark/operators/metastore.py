"""Metastore DDL sync for committed Parquet tables.

Re-expresses the reference's HadoopDBConnector / HiveDBConnector
(waimak-core/.../metastore/MetastoreUtils.scala:137-199,
waimak-hive/.../HiveDBConnector.scala:16-112): on commit-finish, each
committed label's table is created (schema inferred from a Parquet
footer) or repointed at the new snapshot location. The natural PySpark
path is ``spark.sql`` against the session's built-in Hive metastore
(``HiveSparkSQLConnector``, HiveDBConnector.scala:94-112); the dummy
connector collects DDL strings for tests or manual submission.
"""

from __future__ import annotations

from typing import Optional, Sequence

from ..dataflow.exceptions import DataFlowException

FORCE_RECREATE_TABLES = "spark.waimak.metastore.forceRecreateTables"
FORCE_RECREATE_TABLES_DEFAULT = False


class HadoopDBConnector:
    """DDL generator + submitter. Subclasses define ``submit_ddls``."""

    def __init__(self, context, database: str,
                 force_recreate_tables: Optional[bool] = None):
        self.context = context
        self.database = database
        self._force_recreate = force_recreate_tables

    # -- config ----------------------------------------------------------------
    @property
    def force_recreate_tables(self) -> bool:
        if self._force_recreate is not None:
            return self._force_recreate
        return self.context.get_boolean(FORCE_RECREATE_TABLES,
                                        FORCE_RECREATE_TABLES_DEFAULT)

    # -- schema inference (HiveDBConnector.getSchema, :56-64) ------------------
    def _find_parquet_file(self, path: str,
                           partition_columns: Sequence[str]) -> str:
        pattern = "/".join([path.rstrip("/")]
                           + [f"{c}=*" for c in partition_columns]
                           + ["part-*.parquet"])
        files = sorted(self.context.file_ops.glob(pattern))
        if not files:
            raise DataFlowException(
                f"Could not find parquet file at '{path}' to infer schema "
                f"for table '{self.database}.{path.rsplit('/', 1)[-1]}'")
        return files[0]

    def _schema_string(self, parquet_file: str) -> str:
        schema = self.context.spark.read.parquet(parquet_file).schema
        cols = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                         for f in schema.fields)
        return f"({cols})"

    # -- DDL builders (MetastoreUtils.scala:137-188) ---------------------------
    def create_table_from_parquet_ddl(self, table_name: str, path: str,
                                      external: bool = True,
                                      partition_columns: Sequence[str] = (),
                                      if_not_exists: bool = True) -> list[str]:
        qualified = f"{self.database}.{table_name}"
        parquet_file = self._find_parquet_file(path, partition_columns)
        schema = self._schema_string(parquet_file)
        ine = "if not exists " if if_not_exists else ""
        ext = "external " if external else ""
        if not partition_columns:
            return [f"create {ext}table {ine}{qualified} {schema} "
                    f"stored as parquet location '{path}'"]
        parts = ", ".join(f"{c} string" for c in partition_columns)
        return [
            f"create {ext}table {ine}{qualified} {schema} "
            f"partitioned by ({parts}) stored as parquet location '{path}'",
            f"msck repair table {qualified}",
        ]

    def drop_table_ddl(self, table_name: str, if_exists: bool = True) -> str:
        opt = " if exists " if if_exists else " "
        return f"drop table{opt}{self.database}.{table_name}"

    def update_table_location_ddl(self, table_name: str, path: str) -> str:
        return (f"alter table {self.database}.{table_name} "
                f"set location '{path}'")

    def recreate_table_ddls(self, table_name: str, path: str,
                            partition_columns: Sequence[str] = ()) -> list[str]:
        return [self.drop_table_ddl(table_name)] + \
            self.create_table_from_parquet_ddl(
                table_name, path, partition_columns=partition_columns)

    def update_table_parquet_location_ddls(
            self, table_name: str, path: str,
            partition_columns: Sequence[str] = ()) -> list[str]:
        """Partitioned or force-recreate → drop + create; otherwise create
        if missing + set location (MetastoreUtils.scala:174-188)."""
        if partition_columns or self.force_recreate_tables:
            return self.recreate_table_ddls(table_name, path,
                                            partition_columns)
        return self.create_table_from_parquet_ddl(table_name, path) + \
            [self.update_table_location_ddl(table_name, path)]

    # -- submission ------------------------------------------------------------
    def submit_ddls(self, ddls: Sequence[str]) -> None:
        raise NotImplementedError

    def update_table_location(self, _db: Optional[str], table_name: str,
                              path: str,
                              partition_cols: Sequence[str] = ()) -> None:
        """Hook called by the committer's finish step (commit.py)."""
        self.submit_ddls(
            self.update_table_parquet_location_ddls(table_name, path,
                                                    partition_cols))


class HiveSparkSQLConnector(HadoopDBConnector):
    """Submit DDLs through ``spark.sql`` against the session metastore
    (HiveDBConnector.scala:94-112)."""

    def __init__(self, context, database: str,
                 create_database_if_not_exists: bool = False,
                 force_recreate_tables: Optional[bool] = None):
        super().__init__(context, database, force_recreate_tables)
        self.create_database_if_not_exists = create_database_if_not_exists

    def submit_ddls(self, ddls: Sequence[str]) -> None:
        all_ddls = list(ddls)
        if self.create_database_if_not_exists:
            all_ddls = [f"create database if not exists {self.database}"] \
                + all_ddls
        for ddl in all_ddls:
            self.context.spark.sql(ddl)


class HiveDummyConnector(HadoopDBConnector):
    """Collects DDLs instead of submitting them — for tests or manual
    runs (HiveDBConnector.scala:74-83)."""

    def __init__(self, context, database: str = "test",
                 force_recreate_tables: Optional[bool] = None):
        super().__init__(context, database, force_recreate_tables)
        self.ran_ddls: list[list[str]] = []

    def submit_ddls(self, ddls: Sequence[str]) -> None:
        self.ran_ddls.append(list(ddls))

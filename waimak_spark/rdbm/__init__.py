"""Incremental RDBM ingestion: watermark-driven JDBC extraction with
split-predicate partitioning, dialect PK discovery, and SQL Server
temporal-table support (including the delete-detecting temporal snapshot).

Re-expresses the reference's waimak-rdbm-ingestion module
(RDBMExtractor.scala, PostgresExtractor.scala, SQLServerExtractor.scala,
SQLServerTemporalExtractor.scala, RDBMIngestionUtils.scala,
RDBMIngestionActions.scala). All query generation is pure string functions
(unit-tested verbatim); the Spark boundary is ``spark.read.jdbc`` with the
generated subquery + predicates, so each predicate partition opens its own
JDBC connection on an executor.
"""

from .sqlgen import (
    TableExtractionMetadata,
    SQLServerTemporalTableMetadata,
    select_query,
    from_query_part,
    split_point_col,
    split_points_query,
    split_points_to_predicates,
    temporal_select_query,
    temporal_from_query_part,
    POSTGRES_PK_QUERY,
    SQLSERVER_PK_QUERY,
)
from .kernels import lower_case_all, snapshot_temporal_table_dataset
from .extractor import (
    IncorrectUserPKException,
    PKsNotFoundOrProvidedException,
    PostgresExtractor,
    RDBMExtractor,
    SQLServerExtractor,
    SQLServerTemporalExtractor,
)

__all__ = [
    "TableExtractionMetadata", "SQLServerTemporalTableMetadata",
    "select_query", "from_query_part", "split_point_col",
    "split_points_query", "split_points_to_predicates",
    "temporal_select_query", "temporal_from_query_part",
    "POSTGRES_PK_QUERY", "SQLSERVER_PK_QUERY",
    "lower_case_all", "snapshot_temporal_table_dataset",
    "RDBMExtractor", "PostgresExtractor", "SQLServerExtractor",
    "SQLServerTemporalExtractor", "IncorrectUserPKException",
    "PKsNotFoundOrProvidedException",
]

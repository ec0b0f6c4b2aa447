from .cache import CacheAsParquetExtension, SparkCacheExtension
from .commit import (
    CommitEntry,
    CommitMetadataExtension,
    DataCommitter,
    ParquetDataCommitter,
    date_based_snapshot_cleanup,
)
from .manifest_commit import ManifestParquetDataCommitter, read_manifest_table
from .metastore import (
    HadoopDBConnector,
    HiveDummyConnector,
    HiveSparkSQLConnector,
    ImpalaDBConnector,
    ImpalaDummyConnector,
    ImpalaJDBCConnector,
    amend_data_types_for_impala,
    standardize_name_for_impala,
)

__all__ = [
    "CacheAsParquetExtension",
    "CommitEntry",
    "CommitMetadataExtension",
    "DataCommitter",
    "HadoopDBConnector",
    "HiveDummyConnector",
    "HiveSparkSQLConnector",
    "ImpalaDBConnector",
    "ImpalaDummyConnector",
    "ImpalaJDBCConnector",
    "ManifestParquetDataCommitter",
    "ParquetDataCommitter",
    "SparkCacheExtension",
    "amend_data_types_for_impala",
    "date_based_snapshot_cleanup",
    "read_manifest_table",
    "standardize_name_for_impala",
]

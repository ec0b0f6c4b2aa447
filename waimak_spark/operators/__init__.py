from .cache import CacheAsParquetExtension, SparkCacheExtension
from .commit import (
    CommitEntry,
    CommitMetadataExtension,
    DataCommitter,
    ParquetDataCommitter,
    date_based_snapshot_cleanup,
)
from .layout import (
    ZORDER_BITS,
    equidepth_bucket,
    interleave_bits,
    zorder_boundaries,
    zorder_key,
    zorder_layout,
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
    "ZORDER_BITS",
    "amend_data_types_for_impala",
    "equidepth_bucket",
    "interleave_bits",
    "date_based_snapshot_cleanup",
    "read_manifest_table",
    "standardize_name_for_impala",
    "zorder_boundaries",
    "zorder_key",
    "zorder_layout",
]

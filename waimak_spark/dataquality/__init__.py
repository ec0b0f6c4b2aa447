"""Data quality checks with alerting.

Re-expresses the reference's waimak-dataquality + waimak-deequ modules
(dataquality/package.scala:16-29, DataQualityMetadataExtension.scala:15-46,
DatasetCheck.scala, DataQualityAlertHandler.scala, deequ/prefabchecks/*)
WITHOUT the Deequ dependency: each prefab check is one native DataFrame
aggregate — completeness = avg(col is not null), uniqueness =
singleton-group fraction, recency = count past a cutoff, generic SQL =
avg(case when cond …) — evaluated on the cached label so the check costs
one small job over data Spark already materialized.
"""

from .core import (
    AlertImportance,
    CollectingAlertHandler,
    DataQualityAlert,
    DataQualityAlertException,
    DataQualityAlertHandler,
    DataQualityCheck,
    DataQualityMetadataExtension,
    DatasetChecks,
    ExceptionQualityAlert,
    LoggingQualityAlert,
    SimpleDatasetCheck,
    add_data_quality_check,
)
from .alerts import (
    EmailQualityAlert,
    SMTPEmailSettings,
    SlackQualityAlert,
)
from .checks import (
    AnomalyCheck,
    Check,
    CheckLevel,
    ComposableCheck,
    add_anomaly_check,
    add_checks,
    size_metric,
)
from .metrics import (
    AbsoluteChangeStrategy,
    BatchNormalStrategy,
    RelativeRateOfChangeStrategy,
    StorageLayerMetricsRepository,
)
from .extension import (
    DataQualityConfigExtension,
    get_configured_alert_handlers,
    register_alert_handler,
    register_prefab_check,
)
from .prefab import (
    completeness_check,
    generic_sql_check,
    outlier_rate_check,
    recent_timestamp_check,
    uniqueness_check,
)

__all__ = [
    "AlertImportance", "DataQualityAlert", "DataQualityAlertException",
    "DataQualityAlertHandler", "DataQualityCheck", "DatasetChecks",
    "SimpleDatasetCheck", "DataQualityMetadataExtension",
    "ExceptionQualityAlert", "LoggingQualityAlert", "CollectingAlertHandler",
    "SlackQualityAlert", "EmailQualityAlert", "SMTPEmailSettings",
    "Check", "CheckLevel", "ComposableCheck", "add_checks",
    "add_data_quality_check", "completeness_check", "uniqueness_check",
    "recent_timestamp_check", "generic_sql_check", "outlier_rate_check",
    "AnomalyCheck", "add_anomaly_check", "size_metric",
    "StorageLayerMetricsRepository", "AbsoluteChangeStrategy",
    "RelativeRateOfChangeStrategy", "BatchNormalStrategy",
    "DataQualityConfigExtension", "get_configured_alert_handlers",
    "register_alert_handler", "register_prefab_check",
]

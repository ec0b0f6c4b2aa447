"""Metrics repository + anomaly (trend-delta) detection — the reference's
``StorageLayerMetricsRepository`` re-expressed on this package's storage
layer.

Reference provenance: waimak-deequ/src/main/scala/com/amazon/deequ/
StorageLayerMetricsRepository.scala:20-48 (an ``AuditTableInfo(name,
Seq("tags"), retain_history=true)`` table; ``save`` appends one analysis
result stamped with the dataset timestamp; ``load`` reads the FULL history
via ``allBetween(None, None)``) and TestStorageLayerMetricsRepository.scala
(two saves a day apart + an ``AbsoluteChangeStrategy`` anomaly check over
``Size()`` that flags a jump).  Deequ's ``VerificationSuite.useRepository
+ saveOrAppendResult + addAnomalyCheck`` flow maps to
:class:`ComposableCheck`'s ``repository=`` / ``anomaly_checks=`` hooks in
``checks.py``.

Spark-first shape: one metric row per (label, metric) per run, stored as a
normal audit-table region (staged write → atomic move, partition-pruned
history reads).  History loads are a single scan of the metrics table —
tiny by construction (a handful of rows per pipeline run), so the anomaly
comparison collects only the per-metric latest-previous values, never data
rows.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime
from typing import Optional, Sequence

from pyspark.sql import DataFrame, Row, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, StringType, StructField,
                               StructType, TimestampType)

from ..storage import AuditTableInfo, FileStorageOps
from ..storage.audit import get_or_create_tables

#: one row per metric value; ``tags`` plays the reference's ResultKey.tags
#: role (a free-form run discriminator and the table's primary-key column)
METRIC_SCHEMA = StructType([
    StructField("tags", StringType(), False),
    StructField("label", StringType(), False),
    StructField("metric_name", StringType(), False),
    StructField("metric_value", DoubleType(), True),
    StructField("dataset_ts", TimestampType(), False),
])


class StorageLayerMetricsRepository:
    """Persist per-check metric rows to an audit table and load them back.

    The table is created on first ``save`` with primary keys
    ``(tags, label, metric_name)`` and ``retain_history=True`` — every run
    keeps its row (the reference keeps full history the same way;
    StorageLayerMetricsRepository.scala:24 uses PK ``tags`` +
    retainHistory), so trend queries can look arbitrarily far back.
    """

    def __init__(self, spark: SparkSession, storage_base_path: str,
                 table_name: str = "metrics"):
        self.spark = spark
        self.ops = FileStorageOps(spark, storage_base_path)
        self.table_name = table_name

    def _table(self):
        info = AuditTableInfo(
            self.table_name, ["tags", "label", "metric_name"], {}, True)
        return get_or_create_tables(
            self.ops, [self.table_name], lambda _n: info)[0]

    def save(self, label: str, metrics: dict[str, float],
             dataset_ts: datetime, tags: str = "") -> None:
        """Append one region holding this run's metric rows, stamped with
        ``dataset_ts`` as the audit ``_de_last_updated`` (the reference
        writes ``dataSetDateTS`` the same way, :33-35)."""
        if not metrics:
            return
        rows = [Row(tags=tags, label=label, metric_name=k,
                    metric_value=(None if v is None else float(v)),
                    dataset_ts=dataset_ts)
                for k, v in sorted(metrics.items())]
        df = self.spark.createDataFrame(rows, METRIC_SCHEMA)
        self._table().append(df, "dataset_ts")

    def load(self) -> Optional[DataFrame]:
        """Full metric history (``allBetween(None, None)``, :40-46), or
        None when nothing was ever saved."""
        df = self._table().all_between(None, None)
        if df is None:
            return None
        return df.select("tags", "label", "metric_name", "metric_value",
                         "dataset_ts")

    def success_metrics_json(self, for_metrics: Optional[Sequence[str]]
                             = None) -> str:
        """History as a JSON array, newest first — the
        ``load().forAnalyzers(...).getSuccessMetricsAsJson()`` surface the
        reference test asserts (TestStorageLayerMetricsRepository.scala:
        58-62: name / dataset_date-millis / value keys, newest run
        first)."""
        import json

        hist = self.load()
        if hist is None:
            return "[]"
        if for_metrics:
            hist = hist.where(F.col("metric_name").isin(list(for_metrics)))
        rows = hist.select("metric_name", "label", "metric_value",
                           "dataset_ts").collect()
        rows.sort(key=lambda r: (r["dataset_ts"], r["metric_name"]),
                  reverse=True)
        epoch = datetime(1970, 1, 1)
        return json.dumps([
            {"name": r["metric_name"],
             "dataset_date": (r["dataset_ts"] - epoch).total_seconds() * 1000.0,
             "label": r["label"],
             "value": r["metric_value"]}
            for r in rows])

    def previous_values(self, label: str, metric_names: Sequence[str],
                        before_ts: datetime) -> dict[str, float]:
        """Latest stored value per metric strictly BEFORE ``before_ts`` —
        the comparison point for trend-delta alerting.  One pruned scan +
        tiny grouped collect (rows here are one-per-metric-per-run)."""
        hist = self.load()
        if hist is None or not metric_names:
            return {}
        rows = (hist.where((F.col("label") == label)
                           & F.col("metric_name").isin(list(metric_names))
                           & (F.col("dataset_ts") < F.lit(before_ts)))
                .withColumn("_rn", F.row_number().over(
                    Window.partitionBy("metric_name")
                    .orderBy(F.col("dataset_ts").desc())))
                .where(F.col("_rn") == 1)
                .select("metric_name", "metric_value").collect())
        return {r["metric_name"]: r["metric_value"] for r in rows}


# ---------------------------------------------------------------------------
# anomaly strategies (Deequ's anomalydetection.* equivalents)
# ---------------------------------------------------------------------------


class AnomalyStrategy:
    """Compare the current metric value to the latest previous one and
    return a human-readable reason when anomalous, else None."""

    def detect(self, previous: float, current: float) -> Optional[str]:
        raise NotImplementedError


@dataclass(frozen=True)
class AbsoluteChangeStrategy(AnomalyStrategy):
    """Anomaly when ``current - previous`` leaves
    ``[max_rate_decrease, max_rate_increase]`` (Deequ
    AbsoluteChangeStrategy; the reference test uses
    ``maxRateIncrease=2.0`` over Size and a 2→5 jump trips it)."""

    max_rate_decrease: Optional[float] = None
    max_rate_increase: Optional[float] = None

    def detect(self, previous: float, current: float) -> Optional[str]:
        change = current - previous
        if (self.max_rate_increase is not None
                and change > self.max_rate_increase):
            return (f"change {change:g} > max increase "
                    f"{self.max_rate_increase:g} (prev {previous:g}, "
                    f"now {current:g})")
        if (self.max_rate_decrease is not None
                and change < self.max_rate_decrease):
            return (f"change {change:g} < max decrease "
                    f"{self.max_rate_decrease:g} (prev {previous:g}, "
                    f"now {current:g})")
        return None


@dataclass(frozen=True)
class RelativeRateOfChangeStrategy(AnomalyStrategy):
    """Anomaly when ``current / previous`` leaves
    ``[max_rate_decrease, max_rate_increase]`` (Deequ
    RelativeRateOfChangeStrategy).  A zero previous value with a non-zero
    current one is always anomalous (rate undefined)."""

    max_rate_decrease: Optional[float] = None
    max_rate_increase: Optional[float] = None

    def detect(self, previous: float, current: float) -> Optional[str]:
        if previous == 0:
            return (None if current == 0 else
                    f"rate undefined: prev 0, now {current:g}")
        rate = current / previous
        if (self.max_rate_increase is not None
                and rate > self.max_rate_increase):
            return (f"rate {rate:g} > max increase "
                    f"{self.max_rate_increase:g} (prev {previous:g}, "
                    f"now {current:g})")
        if (self.max_rate_decrease is not None
                and rate < self.max_rate_decrease):
            return (f"rate {rate:g} < max decrease "
                    f"{self.max_rate_decrease:g} (prev {previous:g}, "
                    f"now {current:g})")
        return None

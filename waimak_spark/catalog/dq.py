"""Data-quality catalog entry: a REAL metrics-repository round trip whose
trend rows are oracle-checkable in plain SQL.

The build runs the composable-check machinery twice over ``orders`` —
run 1 on a deterministic subset (every third order withheld), run 2 on the
full table — persisting each run's metrics (size, mean price) to a
:class:`StorageLayerMetricsRepository` (an audit table on disk, staged
writes + partition-pruned reads).  ``dq_metrics_trend`` then answers the
trend question the repository exists for: per metric, the previous value,
the current value, and the delta (the same comparison the anomaly
strategies make; StorageLayerMetricsRepository.scala:20-48,
TestStorageLayerMetricsRepository.scala's two-run scenario).

The oracle recomputes both runs' aggregates straight from ``orders`` and
reconstructs the lag in ANSI SQL, so a hash match certifies the whole
path: the one-pass check aggregation, metric persistence through the
storage layer, history reads, and the trend window."""

from __future__ import annotations

import shutil
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_BUILD_MARKER = "_BUILD_OK"
_BUILD_VERSION = "v1"
WITHHOLD_EVERY = 3  # run 1 withholds every third order
T1 = datetime(2019, 7, 31, 12, 0, 0)
T2 = datetime(2019, 8, 1, 12, 0, 0)


def _base_dir(sf_dir: str) -> str:
    tag = sf_dir.strip("/").replace("/", "_")
    return f"/tmp/waimak_catalog_dq/{tag}"


def _build_metrics(spark: SparkSession, sf_dir: str):
    """Run the check machinery twice (once per 'day') and persist metrics;
    build-once behind a versioned marker so bench laps and repeated driver
    calls never append duplicate history."""
    from ..dataquality import (Check, CheckLevel, ComposableCheck,
                               StorageLayerMetricsRepository)
    from ..storage import FileStorageOps

    base = _base_dir(sf_dir)
    ops = FileStorageOps(spark, base)
    marker = f"{base}/{_BUILD_MARKER}"

    def _marker_current() -> bool:
        try:
            return (ops.fops.exists(marker)
                    and ops.fops.read_string(marker).strip() == _BUILD_VERSION)
        except Exception:
            return False

    repo = StorageLayerMetricsRepository(spark, base)
    if not _marker_current():
        shutil.rmtree(base, ignore_errors=True)
        repo = StorageLayerMetricsRepository(spark, base)
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        run1 = orders.where(F.col("o_orderkey") % WITHHOLD_EVERY != 0)
        for df, ts in ((run1, T1), (orders, T2)):
            check = ComposableCheck(
                [Check(CheckLevel.WARNING, "orders basics")
                 .has_size(lambda n: n >= 0)
                 .has_mean("o_totalprice", lambda v: v is not None)],
                repository=repo, dataset_ts=ts)
            check.get_alerts("orders", df)  # evaluates AND persists
        ops.fops.write_string(marker, _BUILD_VERSION)
    return repo


def dq_metrics_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    repo = _build_metrics(spark, sf_dir)
    hist = repo.load().where(F.col("label") == "orders")
    w = Window.partitionBy("metric_name").orderBy("dataset_ts")
    return (hist
            .withColumn("prev", F.lag("metric_value").over(w))
            .where(F.col("prev").isNotNull())
            .select(
                "metric_name",
                F.round("prev", 4).alias("prev_value"),
                F.round("metric_value", 4).alias("value"),
                F.round(F.col("metric_value") - F.col("prev"), 4)
                .alias("delta")))


TREND_ORACLE = f"""
    with m as (
        select 'size' as metric_name, 1 as run,
               cast(count(*) as double) as v
        from orders where o_orderkey % {WITHHOLD_EVERY} <> 0
        union all
        select 'mean(o_totalprice)', 1, avg(o_totalprice)
        from orders where o_orderkey % {WITHHOLD_EVERY} <> 0
        union all
        select 'size', 2, cast(count(*) as double) from orders
        union all
        select 'mean(o_totalprice)', 2, avg(o_totalprice) from orders
    ), lagged as (
        select metric_name, v,
               lag(v) over (partition by metric_name order by run) as prev
        from m
    )
    select metric_name, round(prev, 4) as prev_value, round(v, 4) as value,
           round(v - prev, 4) as delta
    from lagged where prev is not null
"""

ENTRIES = {
    "dq_metrics_trend": {"fn": dq_metrics_trend, "oracle": TREND_ORACLE},
}

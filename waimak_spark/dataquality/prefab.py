"""Prefab data-quality checks as single DataFrame aggregates — the four
checks the reference ships via Deequ (waimak-deequ/.../prefabchecks/*),
re-expressed natively:

* completeness — ``avg(col is not null)`` per column, one aggregate row
  for ALL columns (CompletenessCheck.scala);
* uniqueness — fraction of (columns)-combinations occurring exactly once
  (Deequ ``hasUniqueness`` semantics, UniquenessCheck.scala);
* recent timestamp — any row with ``col >= now - N hours``
  (RecentTimestampCheck.scala);
* generic SQL — every row satisfies a boolean SQL condition
  (GenericSQLCheck.scala).

Each check body runs ONE Spark job over the (cached) label.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .core import (
    AlertImportance,
    DataQualityAlert,
    DatasetChecks,
    SimpleDatasetCheck,
)


def completeness_check(columns: Sequence[str],
                       warning_threshold: Optional[float] = None,
                       critical_threshold: Optional[float] = None
                       ) -> DatasetChecks:
    """Alert when the non-null fraction of any column drops below the
    thresholds."""
    cols = list(columns)

    def metric(df: DataFrame) -> DataFrame:
        return df.agg(*[
            F.avg(F.col(c).isNotNull().cast("double")).alias(c) for c in cols
        ])

    def alert(mdf: DataFrame, label: str):
        row = mdf.collect()[0]
        alerts = []
        for threshold, importance in (
                (critical_threshold, AlertImportance.CRITICAL),
                (warning_threshold, AlertImportance.WARNING)):
            if threshold is None:
                continue
            for c in cols:
                completeness = row[c] if row[c] is not None else 0.0
                if completeness < threshold:
                    alerts.append(DataQualityAlert(
                        f"Less than {threshold * 100}% of {c} values were "
                        f"complete on label {label} "
                        f"(got {completeness * 100:.1f}%).", importance))
        return alerts

    return DatasetChecks([SimpleDatasetCheck(metric, alert)])


def uniqueness_check(columns: Sequence[str],
                     warning_threshold: Optional[float] = 1.0,
                     critical_threshold: Optional[float] = None
                     ) -> DatasetChecks:
    """Deequ ``hasUniqueness``: fraction of column-combinations that occur
    exactly once; defaults to warning when not fully unique."""
    cols = list(columns)

    def metric(df: DataFrame) -> DataFrame:
        return (df.groupBy(*cols).count()
                .agg(F.count("*").alias("combos"),
                     F.count(F.when(F.col("count") == 1, 1)).alias("unique"),
                     F.sum("count").alias("rows")))

    def alert(mdf: DataFrame, label: str):
        row = mdf.collect()[0]
        rows = row["rows"] or 0
        fraction = (row["unique"] / rows) if rows else 1.0
        alerts = []
        for threshold, importance in (
                (critical_threshold, AlertImportance.CRITICAL),
                (warning_threshold, AlertImportance.WARNING)):
            if threshold is not None and fraction < threshold:
                alerts.append(DataQualityAlert(
                    f"{','.join(cols)} was not {threshold * 100}% unique on "
                    f"label {label} (got {fraction * 100:.1f}%).", importance))
        return alerts

    return DatasetChecks([SimpleDatasetCheck(metric, alert)])


def recent_timestamp_check(column: str, hours_to_look_back: int = 6,
                           alert_level: str = "warning",
                           now_override: Optional[datetime] = None
                           ) -> DatasetChecks:
    """Alert when no row's timestamp is within the look-back window —
    flags unexpectedly stale data."""
    importance = AlertImportance.of(
        "critical" if alert_level == "critical" else "warning")
    if alert_level not in ("warning", "critical"):
        raise ValueError(
            f"Invalid alert level {alert_level} for recentTimestampCheck "
            f"on column {column}")

    def metric(df: DataFrame) -> DataFrame:
        now = now_override or datetime.utcnow()
        cutoff = now - timedelta(hours=hours_to_look_back)
        return df.where(F.col(column) >= F.lit(cutoff)) \
                 .agg(F.count("*").alias("recent"))

    def alert(mdf: DataFrame, label: str):
        if (mdf.collect()[0]["recent"] or 0) > 0:
            return []
        return [DataQualityAlert(
            f"No new data in the last {hours_to_look_back} hours "
            f"on label {label}.", importance)]

    return DatasetChecks([SimpleDatasetCheck(metric, alert)])


def generic_sql_check(warning_checks: Sequence[str] = (),
                      critical_checks: Sequence[str] = ()) -> DatasetChecks:
    """Every row must satisfy each boolean SQL condition (e.g.
    ``"my_column > 5"``); one aggregate evaluates all conditions."""
    warn, crit = list(warning_checks), list(critical_checks)
    conds = [(c, AlertImportance.WARNING) for c in warn] + \
            [(c, AlertImportance.CRITICAL) for c in crit]

    def metric(df: DataFrame) -> DataFrame:
        return df.agg(*[
            F.avg(F.when(F.expr(cond), 1.0).otherwise(0.0)).alias(f"c{i}")
            for i, (cond, _) in enumerate(conds)
        ])

    def alert(mdf: DataFrame, label: str):
        row = mdf.collect()[0]
        out = []
        for i, (cond, importance) in enumerate(conds):
            satisfied = row[f"c{i}"]
            if satisfied is not None and satisfied < 1.0:
                out.append(DataQualityAlert(
                    f"generic sql constraint [{cond}] failed on label "
                    f"{label} ({satisfied * 100:.1f}% of rows satisfied).",
                    importance))
        return out

    return DatasetChecks([SimpleDatasetCheck(metric, alert)])


def outlier_rate_check(column: str,
                       warning_threshold: float = 0.05,
                       critical_threshold: Optional[float] = None,
                       k: float = 3.0,
                       group_col: Optional[str] = None,
                       method: str = "exact",
                       id_col: Optional[str] = None,
                       sketch_k: int = 256) -> DatasetChecks:
    """Robust outlier-rate check (beyond the reference's four prefabs):
    alert when the fraction of values outside ``median ± k * 1.4826 *
    MAD`` exceeds the thresholds — the classic robust z-score rule
    (Hampel; 1.4826 scales MAD to sigma under normality), immune to the
    outliers it measures, unlike a mean/stddev rule.  With ``group_col``
    the rule evaluates per group and the alert names the worst group.

    ``method="exact"`` (default): one exact-median pass + one MAD pass +
    one rate pass over the (cached) label — each percentile is a full
    per-group sort.  Right for an already-cached DQ label at test scale.

    ``method="kmv"`` — **the 100 TB path**: median and MAD are estimated
    from the seeded KMV bottom-``sketch_k`` uniform row sample
    (:func:`waimak_spark.functions.sketch.kmv_bottomk` — bounded
    ``sketch_k``-row state per group, one map pass + salted bounded
    top-k, NO full sort), then one rate pass over the full data with the
    estimated bounds.  Requires ``id_col`` (a numeric row id whose
    seeded hash drives the sample).  Estimated quantiles carry the
    sketch's ``~2/sqrt(sketch_k)`` rank-error bound (DKW), so the
    resulting rate differs from the exact rule only by the mass within
    that rank band around the clip bounds — lockstep-bounded in
    tests/test_dataquality.py::TestOutlierRateCheck::
    test_kmv_method_tracks_exact."""
    if method not in ("exact", "kmv"):
        raise ValueError(f"method must be 'exact' or 'kmv', got {method!r}")
    if method == "kmv" and not id_col:
        raise ValueError("method='kmv' needs id_col — the KMV sample "
                         "selects rows by seeded hash of a numeric id")
    keys = [group_col] if group_col else []

    def _exact_bounds(df: DataFrame) -> DataFrame:
        """(keys..., _med2, _mad) via two exact full-sort percentiles."""
        med = (df.groupBy(*keys)
               .agg(F.expr(f"percentile({column}, 0.5)").alias("_med")))
        with_med = df.join(F.broadcast(med), keys) if keys \
            else df.crossJoin(F.broadcast(med))
        return (with_med.groupBy(*keys)
                .agg(F.expr(f"percentile(abs({column} - _med), 0.5)")
                     .alias("_mad"),
                     F.first("_med").alias("_med2")))

    def _kmv_bounds(df: DataFrame) -> DataFrame:
        """Same (keys..., _med2, _mad) shape, but both percentiles run
        over the bounded bottom-k sample — the only full-data work is
        the sample selection's map pass + salted bounded top-k."""
        from ..functions.sketch import kmv_bottomk

        gcol = group_col if group_col else "_g_all"
        base = df if group_col else df.withColumn("_g_all", F.lit(0))
        samp = kmv_bottomk(base, value_col=column, group_col=gcol,
                           id_col=id_col, k=sketch_k)
        med = (samp.groupBy("g")
               .agg(F.expr("percentile(v, 0.5)").alias("_med")))
        bounds = (samp.join(F.broadcast(med), "g")
                  .groupBy("g")
                  .agg(F.expr("percentile(abs(v - _med), 0.5)")
                       .alias("_mad"),
                       F.first("_med").alias("_med2")))
        if group_col:
            return bounds.withColumnRenamed("g", group_col)
        return bounds.drop("g")

    def metric(df: DataFrame) -> DataFrame:
        bounds = _exact_bounds(df) if method == "exact" else _kmv_bounds(df)
        with_mad = df.join(F.broadcast(bounds), keys) if keys \
            else df.crossJoin(F.broadcast(bounds))
        lo = F.col("_med2") - k * 1.4826 * F.col("_mad")
        hi = F.col("_med2") + k * 1.4826 * F.col("_mad")
        return (with_mad.groupBy(*keys)
                .agg(F.avg(((F.col(column) < lo) | (F.col(column) > hi))
                           .cast("double")).alias("outlier_rate"),
                     F.count(column).alias("n")))

    def alert(mdf: DataFrame, label: str):
        rows = mdf.collect()
        alerts = []
        for threshold, importance in (
                (critical_threshold, AlertImportance.CRITICAL),
                (warning_threshold, AlertImportance.WARNING)):
            if threshold is None:
                continue
            for row in rows:
                rate = row["outlier_rate"] or 0.0
                if rate > threshold:
                    where = (f" (group {row[group_col]})"
                             if group_col else "")
                    alerts.append(DataQualityAlert(
                        f"Outlier rate of {column} on label {label}"
                        f"{where} was {rate * 100:.2f}% "
                        f"(> {threshold * 100}% at k={k}).", importance))
                    break  # one alert per severity, worst-first scan
        return alerts

    return DatasetChecks([SimpleDatasetCheck(metric, alert)])

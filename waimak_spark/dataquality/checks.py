"""Composable check builder — the reference's Deequ surface
(waimak-deequ/.../deequ/package.scala:30-99, DeequCheck.scala:23-95)
re-expressed natively, without the Deequ library.

A :class:`Check` is a chainable list of constraints at one severity
level (``CheckLevel.ERROR`` → Critical alerts, ``CheckLevel.WARNING`` →
Warning, mirroring DeequCheck.getAlertImportance); a
:class:`ComposableCheck` bundles many Checks into a
``DataQualityCheck`` that plugs into ``add_data_quality_check`` /
``DataQualityMetadataExtension`` like any other check.

Spark-first evaluation: every scalar constraint (size, completeness,
min/max/mean/sum, satisfies-fraction, pattern-fraction, approx distinct)
across ALL bundled checks is computed in ONE ``df.agg`` pass over the
cached label; only uniqueness constraints need their own grouped pass
(same two-phase shape Deequ uses). Constraint assertions run driver-side
on the one collected metrics row.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .core import (
    AlertImportance,
    DataQualityAlert,
    DataQualityCheck,
    DataQualityAlertHandler,
)


class CheckLevel(enum.Enum):
    ERROR = AlertImportance.CRITICAL
    WARNING = AlertImportance.WARNING


@dataclass(frozen=True)
class _Constraint:
    description: str
    #: scalar aggregate expression, or None for grouped (uniqueness)
    metric: object  # Column | None
    assertion: Callable[[object], bool]
    #: columns for the grouped uniqueness pass (when metric is None)
    group_cols: tuple[str, ...] = ()


class Check:
    """A chainable set of constraints evaluated at one severity level —
    the VerificationRunBuilder ``Check`` equivalent. All builders return
    a NEW Check (immutabile chaining, like the reference's case class)."""

    def __init__(self, level: CheckLevel, description: str,
                 constraints: Sequence[_Constraint] = ()):
        self.level = level
        self.description = description
        self.constraints = list(constraints)

    def _with(self, c: _Constraint) -> "Check":
        return Check(self.level, self.description, self.constraints + [c])

    # -- constraint builders (Deequ Check.* equivalents) ----------------------
    def has_size(self, assertion: Callable[[int], bool]) -> "Check":
        return self._with(_Constraint(
            "size", F.count(F.lit(1)), assertion))

    def is_complete(self, column: str) -> "Check":
        return self.has_completeness(column, lambda v: v == 1.0)

    def has_completeness(self, column: str,
                         assertion: Callable[[float], bool]) -> "Check":
        return self._with(_Constraint(
            f"completeness({column})",
            F.coalesce(F.avg(F.col(column).isNotNull().cast("double")),
                       F.lit(1.0)),
            assertion))

    def has_min(self, column: str, assertion) -> "Check":
        return self._with(_Constraint(
            f"min({column})", F.min(column), assertion))

    def has_max(self, column: str, assertion) -> "Check":
        return self._with(_Constraint(
            f"max({column})", F.max(column), assertion))

    def has_mean(self, column: str, assertion) -> "Check":
        return self._with(_Constraint(
            f"mean({column})", F.avg(column), assertion))

    def has_sum(self, column: str, assertion) -> "Check":
        return self._with(_Constraint(
            f"sum({column})", F.sum(column), assertion))

    def has_approx_count_distinct(self, column: str, assertion) -> "Check":
        return self._with(_Constraint(
            f"approxCountDistinct({column})",
            F.approx_count_distinct(column), assertion))

    def satisfies(self, predicate: str, name: str,
                  assertion: Callable[[float], bool] = lambda v: v == 1.0
                  ) -> "Check":
        """Fraction of rows satisfying a SQL predicate (Deequ
        ``satisfies``); default assertion requires every row."""
        return self._with(_Constraint(
            f"satisfies({name})",
            F.coalesce(
                F.avg(F.when(F.expr(predicate), 1.0).otherwise(0.0)),
                F.lit(1.0)),
            assertion))

    def has_pattern(self, column: str, regex: str,
                    assertion: Callable[[float], bool] = lambda v: v == 1.0
                    ) -> "Check":
        return self._with(_Constraint(
            f"pattern({column}, {regex})",
            F.coalesce(
                F.avg(F.when(F.col(column).rlike(regex), 1.0).otherwise(0.0)),
                F.lit(1.0)),
            assertion))

    def is_unique(self, *columns: str) -> "Check":
        return self.has_uniqueness(columns, lambda v: v == 1.0)

    def has_uniqueness(self, columns: Sequence[str],
                       assertion: Callable[[float], bool]) -> "Check":
        """Fraction of (columns)-combinations occurring exactly once —
        needs its own grouped pass (two-phase, as in Deequ)."""
        return self._with(_Constraint(
            f"uniqueness({','.join(columns)})", None, assertion,
            tuple(columns)))


@dataclass(frozen=True)
class AnomalyCheck:
    """A trend-delta check: compute ``metric`` (a scalar aggregate) on the
    current run, compare against the latest value stored in the metrics
    repository, alert when the strategy flags the change — Deequ's
    ``addAnomalyCheck(strategy, analyzer)`` equivalent
    (TestStorageLayerMetricsRepository.scala's AbsoluteChangeStrategy-over-
    Size scenario).  ``metric_name`` keys the history lookup."""

    metric_name: str
    metric: object  # Column — scalar aggregate expression
    strategy: object  # AnomalyStrategy
    level: CheckLevel = CheckLevel.WARNING


def size_metric() -> "tuple[str, object]":
    """Deequ ``Size()``: (name, aggregate) for row count."""
    return "size", F.count(F.lit(1))


class ComposableCheck(DataQualityCheck):
    """Bundle of :class:`Check` objects behaving as one
    ``DataQualityCheck`` — the ``DeequCheck`` equivalent. ``concat``
    composes builder chains exactly like ``DeequCheck.++``.

    With a ``repository`` attached (Deequ ``useRepository`` +
    ``saveOrAppendResult``): every evaluated scalar metric — constraint
    metrics and anomaly metrics — is persisted after evaluation, and each
    :class:`AnomalyCheck` compares against the repository's latest prior
    value (no previous value → first run, no alert, matching Deequ's
    Warning-free first run)."""

    def __init__(self, checks: Sequence[Check] = (),
                 anomaly_checks: Sequence[AnomalyCheck] = (),
                 repository=None, dataset_ts=None, tags: str = ""):
        self.checks = list(checks)
        self.anomaly_checks = list(anomaly_checks)
        self.repository = repository
        self.dataset_ts = dataset_ts
        self.tags = tags

    def concat(self, other: "DataQualityCheck") -> "ComposableCheck":
        if not isinstance(other, ComposableCheck):
            raise TypeError(
                "Can only combine ComposableCheck with ComposableCheck")
        if (self.repository is not None and other.repository is not None
                and self.repository is not other.repository):
            raise ValueError(
                "Cannot combine checks bound to different metrics repositories")
        return ComposableCheck(
            self.checks + other.checks,
            self.anomaly_checks + other.anomaly_checks,
            self.repository or other.repository,
            self.dataset_ts or other.dataset_ts,
            self.tags or other.tags)

    def validate_check(self) -> None:
        for c in self.checks:
            if not c.constraints:
                raise ValueError(
                    f"Check [{c.description}] declares no constraints")
        if self.anomaly_checks and self.repository is None:
            raise ValueError(
                "Anomaly checks need a metrics repository to compare against")

    def get_alerts(self, label: str, df: DataFrame) -> list[DataQualityAlert]:
        flat: list[tuple[Check, _Constraint]] = [
            (c, k) for c in self.checks for k in c.constraints]
        scalar = [(i, c, k) for i, (c, k) in enumerate(flat)
                  if k.metric is not None]
        grouped = [(i, c, k) for i, (c, k) in enumerate(flat)
                   if k.metric is None]
        values: dict[int, object] = {}
        anomaly_values: dict[str, object] = {}
        # ONE agg pass computes constraint metrics AND anomaly metrics
        aggs = [k.metric.alias(f"m{i}") for i, _c, k in scalar]
        aggs += [a.metric.alias(f"a{j}")
                 for j, a in enumerate(self.anomaly_checks)]
        if aggs:
            row = df.agg(*aggs).collect()[0]
            for i, _c, _k in scalar:
                values[i] = row[f"m{i}"]
            for j, a in enumerate(self.anomaly_checks):
                anomaly_values[a.metric_name] = row[f"a{j}"]
        for i, _c, k in grouped:
            stats = (df.groupBy(*k.group_cols).count()
                     .agg(F.count(F.when(F.col("count") == 1, 1))
                          .alias("unique"),
                          F.sum("count").alias("rows")).collect()[0])
            rows = stats["rows"] or 0
            values[i] = (stats["unique"] / rows) if rows else 1.0
        alerts = []
        for i, (check, k) in enumerate(flat):
            value = values[i]
            try:
                ok = bool(k.assertion(value))
            except Exception:
                ok = False  # assertion crashed (e.g. None min) → failure
            if not ok:
                importance = check.level.value
                alerts.append(DataQualityAlert(
                    f"{importance.value} alert for label {label}: check "
                    f"[{check.description}] constraint [{k.description}] "
                    f"failed (value: {value!r})", importance))
        # ONE timestamp for the whole evaluation: the trend comparison and
        # the persisted rows must agree on the run's identity (previously
        # each helper stamped its own utcnow(), so an unset dataset_ts
        # gave the anomaly lookup and the save different timestamps).
        # now(timezone.utc) — utcnow() is deprecated and naive-ambiguous;
        # the repository normalizes to naive-UTC at its boundary.
        from datetime import datetime, timezone

        ts = self.dataset_ts or datetime.now(timezone.utc)
        alerts += self._anomaly_alerts(label, anomaly_values, ts)
        self._persist_metrics(label, flat, values, anomaly_values, ts)
        return alerts

    def _anomaly_alerts(self, label: str,
                        anomaly_values: dict[str, object],
                        ts) -> list[DataQualityAlert]:
        if not self.anomaly_checks or self.repository is None:
            return []
        # window-based strategies (detect_window + window_size) need the
        # last N values; point strategies only the latest one
        max_window = max((getattr(a.strategy, "window_size", 1)
                          for a in self.anomaly_checks), default=1)
        names = [a.metric_name for a in self.anomaly_checks]
        if max_window > 1:
            windows = self.repository.previous_window(
                label, names, ts, max_window)
        else:
            windows = {k: [v] for k, v in self.repository.previous_values(
                label, names, ts).items()}
        alerts = []
        for a in self.anomaly_checks:
            cur = anomaly_values.get(a.metric_name)
            hist = [v for v in windows.get(a.metric_name, []) if v is not None]
            if cur is None or not hist:
                continue  # first run, or metric not computable → no trend
            if hasattr(a.strategy, "detect_window"):
                w = getattr(a.strategy, "window_size", len(hist))
                reason = a.strategy.detect_window(hist[-w:], float(cur))
            else:
                reason = a.strategy.detect(float(hist[-1]), float(cur))
            if reason is not None:
                importance = a.level.value
                alerts.append(DataQualityAlert(
                    f"{importance.value} anomaly for label {label}: metric "
                    f"[{a.metric_name}] {reason}", importance))
        return alerts

    def _persist_metrics(self, label: str, flat, values,
                         anomaly_values: dict[str, object], ts) -> None:
        if self.repository is None:
            return
        out: dict[str, float] = {}
        for i, (_check, k) in enumerate(flat):
            v = values.get(i)
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                # Deequ keys metrics per ANALYZER, so two constraints with
                # the same description are the same metric and must carry
                # the same value (same df, same aggregate). A collision
                # with DIFFERENT values means two distinct aggregates
                # share a description (e.g. satisfies(p1, "x") and
                # satisfies(p2, "x")) — refuse rather than let last write
                # win silently.
                prior = out.get(k.description)
                if prior is not None and prior != float(v):
                    raise ValueError(
                        f"metric name collision: constraint "
                        f"[{k.description}] appears with conflicting "
                        f"values {prior!r} and {float(v)!r} — give the "
                        f"constraints distinct names")
                out[k.description] = float(v)
        for name, v in anomaly_values.items():
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                out[name] = float(v)
        self.repository.save(label, out, ts, self.tags)


def add_checks(flow, label: str, check: Check, *more: Check,
               handlers: Sequence[DataQualityAlertHandler] = ()):
    """``addDeequCheck`` equivalent (deequ/package.scala:63-76): attach
    one or more composable Checks to a label with the given handlers."""
    from .core import add_data_quality_check

    return add_data_quality_check(
        flow, label, ComposableCheck([check, *more]), *handlers)


def add_anomaly_check(flow, label: str, anomaly: AnomalyCheck, repository,
                      *, dataset_ts=None, tags: str = "",
                      handlers: Sequence[DataQualityAlertHandler] = ()):
    """Deequ ``addAnomalyCheck`` + ``useRepository`` + ``saveOrAppend``:
    attach a trend-delta check whose history lives in ``repository``."""
    from .core import add_data_quality_check

    return add_data_quality_check(
        flow, label,
        ComposableCheck([], [anomaly], repository, dataset_ts, tags),
        *handlers)

"""Data-quality flows with injected failing data — scenarios modeled on
the reference's waimak-dataquality / TestDeequPrefabChecks suites."""

from datetime import datetime, timedelta

import pytest

from waimak_spark.dataflow.spark_flow import Waimak
from waimak_spark.dataquality import (
    AlertImportance,
    CollectingAlertHandler,
    DataQualityAlertException,
    ExceptionQualityAlert,
    completeness_check,
    generic_sql_check,
    recent_timestamp_check,
    uniqueness_check,
)


def _df(spark, rows, schema="id int, name string"):
    return spark.createDataFrame(rows, schema)


def _run(spark, tmp_path, df, check, *handlers, label="people"):
    flow = (Waimak.spark_flow(spark, str(tmp_path / "tmp"))
            .open(label, lambda c: df)
            .alias(label, "out")
            .add_data_quality_check(label, check, *handlers))
    return flow.execute()


GOOD = [(1, "a"), (2, "b"), (3, "c")]
WITH_NULLS = [(1, "a"), (2, None), (3, None), (4, None)]
WITH_DUPES = [(1, "a"), (1, "a"), (2, "b")]


class TestPrefabChecks:
    def test_completeness_passes_on_full_column(self, spark, tmp_path):
        h = CollectingAlertHandler()
        _run(spark, tmp_path, _df(spark, GOOD),
             completeness_check(["name"], warning_threshold=0.9), h)
        assert h.alerts == []

    def test_completeness_warns_below_threshold(self, spark, tmp_path):
        h = CollectingAlertHandler()
        _run(spark, tmp_path, _df(spark, WITH_NULLS),
             completeness_check(["name"], warning_threshold=0.5,
                                critical_threshold=0.1), h)
        assert len(h.alerts) == 1
        assert h.alerts[0].importance == AlertImportance.WARNING
        assert "name" in h.alerts[0].alert_message

    def test_completeness_critical_and_warning(self, spark, tmp_path):
        h = CollectingAlertHandler()
        _run(spark, tmp_path, _df(spark, WITH_NULLS),
             completeness_check(["name"], warning_threshold=0.9,
                                critical_threshold=0.5), h)
        importances = {a.importance for a in h.alerts}
        assert importances == {AlertImportance.WARNING,
                               AlertImportance.CRITICAL}

    def test_uniqueness_default_warns_on_dupes(self, spark, tmp_path):
        h = CollectingAlertHandler()
        _run(spark, tmp_path, _df(spark, WITH_DUPES), uniqueness_check(["id"]), h)
        assert len(h.alerts) == 1
        assert "id was not 100.0% unique" in h.alerts[0].alert_message

    def test_uniqueness_passes_when_unique(self, spark, tmp_path):
        h = CollectingAlertHandler()
        _run(spark, tmp_path, _df(spark, GOOD), uniqueness_check(["id"]), h)
        assert h.alerts == []

    def test_recent_timestamp_alerts_on_stale_data(self, spark, tmp_path):
        now = datetime(2020, 6, 1, 12, 0, 0)
        stale = _df(spark, [(1, now - timedelta(hours=48))],
                    "id int, ts timestamp")
        h = CollectingAlertHandler()
        _run(spark, tmp_path, stale,
             recent_timestamp_check("ts", 6, now_override=now), h)
        assert len(h.alerts) == 1
        assert "No new data in the last 6 hours" in h.alerts[0].alert_message

    def test_recent_timestamp_passes_on_fresh_data(self, spark, tmp_path):
        now = datetime(2020, 6, 1, 12, 0, 0)
        fresh = _df(spark, [(1, now - timedelta(hours=1))],
                    "id int, ts timestamp")
        h = CollectingAlertHandler()
        _run(spark, tmp_path, fresh,
             recent_timestamp_check("ts", 6, now_override=now), h)
        assert h.alerts == []

    def test_generic_sql_check(self, spark, tmp_path):
        h = CollectingAlertHandler()
        _run(spark, tmp_path, _df(spark, GOOD),
             generic_sql_check(warning_checks=["id < 3"],
                               critical_checks=["id > 0"]), h)
        assert len(h.alerts) == 1
        assert h.alerts[0].importance == AlertImportance.WARNING
        assert "id < 3" in h.alerts[0].alert_message


class TestAlertRouting:
    def test_exception_handler_raises_after_all_alerts(self, spark, tmp_path):
        collector = CollectingAlertHandler()
        with pytest.raises(Exception) as exc_info:
            _run(spark, tmp_path, _df(spark, WITH_DUPES),
                 uniqueness_check(["id"]), collector, ExceptionQualityAlert())
        # the collecting handler still saw the alert before the raise
        assert len(collector.alerts) == 1
        assert isinstance(exc_info.value.__cause__ or exc_info.value,
                          Exception)

    def test_importance_filtering(self, spark, tmp_path):
        only_critical = CollectingAlertHandler([AlertImportance.CRITICAL])
        _run(spark, tmp_path, _df(spark, WITH_DUPES),
             uniqueness_check(["id"]), only_critical)  # warning-level alert
        assert only_critical.alerts == []

    def test_checks_merged_per_label_and_handler(self, spark, tmp_path):
        h = CollectingAlertHandler()
        dupes = _df(spark, WITH_DUPES)
        flow = (Waimak.spark_flow(spark, str(tmp_path / "tmp"))
                .open("people", lambda c: dupes)
                .alias("people", "out")
                .add_data_quality_check("people", uniqueness_check(["id"]), h)
                .add_data_quality_check(
                    "people", completeness_check(["name"],
                                                 warning_threshold=1.0), h))
        flow.execute()
        messages = " ".join(a.alert_message for a in h.alerts)
        assert "unique" in messages  # dupes flagged; completeness fine
        assert len(h.alerts) == 1

    def test_passing_flow_unaffected(self, spark, tmp_path):
        h = CollectingAlertHandler()
        _, final = _run(spark, tmp_path, _df(spark, GOOD),
                        uniqueness_check(["id"]), h)
        assert final.inputs.get("out").count() == 3

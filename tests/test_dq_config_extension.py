"""Config-driven data quality — mirrors the reference's
DeequConfigurationExtension flow (DeequConfiguration.scala:13-55): checks
and alert handlers declared ONLY in Spark conf, attached by the ``deequ``
configuration extension during prepare_for_execution."""

from contextlib import contextmanager

import pytest

from waimak_spark.dataflow.exceptions import DataFlowException
from waimak_spark.dataflow.spark_flow import Waimak
from waimak_spark.dataquality import (
    AlertImportance,
    CollectingAlertHandler,
    register_alert_handler,
)

ROWS = [(1, "Thingy A"), (2, "Thingy B"), (3, None), (4, "Thingy D"),
        (5, "Thingy E")]

_COLLECTED = []


@register_alert_handler("collecting-test")
def _collecting_test_handler(context):
    h = CollectingAlertHandler()
    _COLLECTED.append(h)
    return h


@contextmanager
def dq_conf(spark, conf: dict[str, str]):
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k in conf:
            spark.conf.unset(k)


def _run_flow(spark, tmp_path, rows=ROWS):
    df = spark.createDataFrame(rows, "id int, name string")
    (Waimak.spark_flow(spark, str(tmp_path / "f"))
     .open("items", lambda c: df)
     .execute())


BASE_CONF = {
    "spark.waimak.dataflow.extensions": "deequ",
    "spark.waimak.dataquality.alerters": "collecting-test",
    "spark.waimak.dataquality.deequ.labelsToMonitor": "items",
}


class TestConfigDrivenChecks:
    def test_conf_declared_completeness_and_uniqueness(self, spark,
                                                       tmp_path):
        conf = dict(BASE_CONF)
        conf.update({
            "spark.waimak.dataquality.deequ.labels.items.checks":
                "completenessCheck,uniquenessCheck",
            "spark.waimak.dataquality.deequ.labels.items."
            "completenessCheck.columns": "name,id",
            "spark.waimak.dataquality.deequ.labels.items."
            "completenessCheck.warningThreshold": "0.9",
            "spark.waimak.dataquality.deequ.labels.items."
            "uniquenessCheck.columns": "id",
        })
        _COLLECTED.clear()
        with dq_conf(spark, conf):
            _run_flow(spark, tmp_path)
        alerts = [a for h in _COLLECTED for a in h.alerts]
        # name is 80% complete -> one warning; id unique + complete -> none
        assert len(alerts) == 1
        assert "name" in alerts[0].alert_message
        assert alerts[0].importance == AlertImportance.WARNING

    def test_generic_sql_with_semicolon_separator(self, spark, tmp_path):
        conf = dict(BASE_CONF)
        conf.update({
            "spark.waimak.dataquality.deequ.labels.items.checks":
                "genericSQLCheck",
            "spark.waimak.dataquality.deequ.labels.items."
            "genericSQLCheck.warningChecks": "id > 0;id < 3",
        })
        _COLLECTED.clear()
        with dq_conf(spark, conf):
            _run_flow(spark, tmp_path)
        alerts = [a for h in _COLLECTED for a in h.alerts]
        # id > 0 holds for all rows; id < 3 fails for 3 of 5 rows
        assert len(alerts) == 1
        assert "id < 3" in alerts[0].alert_message

    def test_unknown_check_name_fails_loudly(self, spark, tmp_path):
        conf = dict(BASE_CONF)
        conf.update({
            "spark.waimak.dataquality.deequ.labels.items.checks":
                "noSuchCheck",
        })
        with dq_conf(spark, conf):
            with pytest.raises(DataFlowException, match="noSuchCheck"):
                _run_flow(spark, tmp_path)

    def test_no_alerters_fails_loudly(self, spark, tmp_path):
        conf = dict(BASE_CONF)
        conf["spark.waimak.dataquality.alerters"] = ""
        conf["spark.waimak.dataquality.deequ.labels.items.checks"] = \
            "uniquenessCheck"
        conf["spark.waimak.dataquality.deequ.labels.items." \
             "uniquenessCheck.columns"] = "id"
        with dq_conf(spark, conf):
            with pytest.raises(DataFlowException, match="alerter"):
                _run_flow(spark, tmp_path)

    def test_unknown_alerter_key_fails_loudly(self, spark, tmp_path):
        conf = dict(BASE_CONF)
        conf["spark.waimak.dataquality.alerters"] = "no-such-service"
        with dq_conf(spark, conf):
            with pytest.raises(DataFlowException, match="no-such-service"):
                _run_flow(spark, tmp_path)

    def test_exception_alerter_from_conf_escalates(self, spark, tmp_path):
        conf = dict(BASE_CONF)
        conf.update({
            "spark.waimak.dataquality.alerters": "exception",
            "spark.waimak.dataquality.alerters.exception.alertOn":
                "Critical",
            "spark.waimak.dataquality.deequ.labels.items.checks":
                "genericSQLCheck",
            "spark.waimak.dataquality.deequ.labels.items."
            "genericSQLCheck.criticalChecks": "id < 0",
        })
        with dq_conf(spark, conf):
            with pytest.raises(Exception, match="id < 0"):
                _run_flow(spark, tmp_path)

    def test_extension_not_enabled_is_inert(self, spark, tmp_path):
        # all the DQ conf present but "deequ" NOT in the extensions list:
        # nothing is attached, nothing fires
        conf = dict(BASE_CONF)
        del conf["spark.waimak.dataflow.extensions"]
        conf["spark.waimak.dataquality.deequ.labels.items.checks"] = \
            "completenessCheck"
        conf["spark.waimak.dataquality.deequ.labels.items."
             "completenessCheck.columns"] = "name"
        conf["spark.waimak.dataquality.deequ.labels.items."
             "completenessCheck.warningThreshold"] = "1.0"
        _COLLECTED.clear()
        with dq_conf(spark, conf):
            _run_flow(spark, tmp_path)
        assert [a for h in _COLLECTED for a in h.alerts] == []

    def test_recent_timestamp_from_conf(self, spark, tmp_path):
        conf = dict(BASE_CONF)
        conf.update({
            "spark.waimak.dataquality.deequ.labels.items.checks":
                "recentTimestampCheck",
            "spark.waimak.dataquality.deequ.labels.items."
            "recentTimestampCheck.column": "ts",
            "spark.waimak.dataquality.deequ.labels.items."
            "recentTimestampCheck.hoursToLookBack": "6",
            "spark.waimak.dataquality.deequ.labels.items."
            "recentTimestampCheck.nowOverride": "2019-08-01T12:00:00",
        })
        _COLLECTED.clear()
        from datetime import datetime

        rows = [(1, datetime(2019, 8, 1, 11, 0, 0))]  # within 6h window
        df = spark.createDataFrame(rows, "id int, ts timestamp")
        with dq_conf(spark, conf):
            (Waimak.spark_flow(spark, str(tmp_path / "f"))
             .open("items", lambda c: df)
             .execute())
        assert [a for h in _COLLECTED for a in h.alerts] == []

        # stale data: newest row is older than the look-back window
        _COLLECTED.clear()
        rows = [(1, datetime(2019, 7, 1, 0, 0, 0))]
        df = spark.createDataFrame(rows, "id int, ts timestamp")
        with dq_conf(spark, conf):
            (Waimak.spark_flow(spark, str(tmp_path / "g"))
             .open("items", lambda c: df)
             .execute())
        alerts = [a for h in _COLLECTED for a in h.alerts]
        assert len(alerts) == 1 and "No new data" in alerts[0].alert_message

"""Metastore DDL assertions via the dummy connectors (the reference's
TestHiveDBConnector / TestImpalaDBConnector pattern: capture instead of
submit)."""

from datetime import date, datetime

import pytest

from waimak_spark.dataflow.spark_flow import Waimak
from waimak_spark.operators.commit import ParquetDataCommitter
from waimak_spark.operators.metastore import (
    FORCE_RECREATE_TABLES,
    HiveDummyConnector,
    ImpalaDummyConnector,
    ImpalaJDBCConnector,
    amend_data_types_for_impala,
    standardize_name_for_impala,
)


@pytest.fixture()
def people_parquet(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    path = str(tmp_path / "people")
    df.write.parquet(path)
    return path


@pytest.fixture()
def ctx(spark, tmp_path):
    from waimak_spark.dataflow.spark_flow import SparkFlowContext

    return SparkFlowContext(spark, str(tmp_path / "tmp"))


class TestDDLGeneration:
    def test_create_table_infers_schema_from_parquet(self, ctx, people_parquet):
        con = HiveDummyConnector(ctx, "testdb")
        ddls = con.create_table_from_parquet_ddl("people", people_parquet)
        assert ddls == [
            "create external table if not exists testdb.people "
            "(id int, name string) stored as parquet "
            f"location '{people_parquet}'"
        ]

    def test_partitioned_create_adds_partition_def_and_repair(
            self, ctx, spark, tmp_path):
        df = spark.createDataFrame([(1, "a", "x")],
                                   "id int, name string, part string")
        path = str(tmp_path / "parted")
        df.write.partitionBy("part").parquet(path)
        con = HiveDummyConnector(ctx, "testdb")
        ddls = con.create_table_from_parquet_ddl(
            "parted", path, partition_columns=["part"])
        assert "partitioned by (part string)" in ddls[0]
        assert ddls[1] == "msck repair table testdb.parted"

    def test_update_location_keeps_table_without_force(self, ctx,
                                                       people_parquet):
        con = HiveDummyConnector(ctx, "testdb")
        ddls = con.update_table_parquet_location_ddls("people", people_parquet)
        assert ddls[-1] == (
            f"alter table testdb.people set location '{people_parquet}'")
        assert not any(d.startswith("drop") for d in ddls)

    def test_update_location_recreates_when_forced(self, ctx, people_parquet):
        con = HiveDummyConnector(ctx, "testdb", force_recreate_tables=True)
        ddls = con.update_table_parquet_location_ddls("people", people_parquet)
        assert ddls[0] == "drop table if exists testdb.people"

    def test_update_location_recreates_when_partitioned(self, ctx, spark,
                                                        tmp_path):
        df = spark.createDataFrame([(1, "x")], "id int, part string")
        path = str(tmp_path / "parted2")
        df.write.partitionBy("part").parquet(path)
        con = HiveDummyConnector(ctx, "testdb")
        ddls = con.update_table_parquet_location_ddls(
            "parted2", path, partition_columns=["part"])
        assert ddls[0] == "drop table if exists testdb.parted2"

    def test_force_recreate_from_conf(self, spark, ctx, people_parquet):
        spark.conf.set(FORCE_RECREATE_TABLES, "true")
        try:
            con = HiveDummyConnector(ctx, "testdb")
            ddls = con.update_table_parquet_location_ddls("people",
                                                          people_parquet)
            assert ddls[0].startswith("drop table")
        finally:
            spark.conf.unset(FORCE_RECREATE_TABLES)

    def test_missing_parquet_raises(self, ctx, tmp_path):
        from waimak_spark.dataflow.exceptions import DataFlowException

        con = HiveDummyConnector(ctx, "testdb")
        with pytest.raises(DataFlowException, match="Could not find parquet"):
            con.create_table_from_parquet_ddl("ghost", str(tmp_path / "ghost"))


class TestImpalaDDLGeneration:
    """Mirrors TestImpalaDBConnector.scala: unqualified table names,
    like-parquet creates, recover partitions, file:-qualified paths."""

    def test_drop_table(self, ctx):
        con = ImpalaDummyConnector(ctx)
        assert con.drop_table_ddl("testTable") == \
            "drop table if exists testTable"

    def test_update_table_location_qualifies_path(self, ctx):
        con = ImpalaDummyConnector(ctx)
        assert con.update_table_location_ddl("testTable", "/path") == \
            "alter table testTable set location 'file:/path'"

    def test_create_non_partitioned_like_parquet(self, ctx, people_parquet):
        con = ImpalaDummyConnector(ctx)
        ddls = con.create_table_from_parquet_ddl("people", people_parquet)
        assert len(ddls) == 1
        assert ddls[0].startswith(
            "create external table if not exists people like parquet "
            "'file:")
        assert f"stored as parquet location 'file:{people_parquet}'" \
            in ddls[0]
        # Impala infers the schema server-side — no inlined column list
        assert "(id int" not in ddls[0]

    def test_create_partitioned_recovers_partitions(self, ctx, spark,
                                                    tmp_path):
        df = spark.createDataFrame([(1, "a", "x")],
                                   "id int, name string, part string")
        path = str(tmp_path / "parted")
        df.write.partitionBy("part").parquet(path)
        con = ImpalaDummyConnector(ctx)
        ddls = con.create_table_from_parquet_ddl(
            "parted", path, partition_columns=["part"])
        assert "like parquet 'file:" in ddls[0]
        assert "/part=x/" in ddls[0]  # schema file from inside a partition
        assert "partitioned by (part string)" in ddls[0]
        assert ddls[1] == "alter table parted recover partitions"

    def test_jdbc_connector_builds_ddls_and_submits_via_hook(
            self, ctx, people_parquet):
        submitted = []

        class StubJDBC(ImpalaJDBCConnector):
            def _run_queries(self, ddls):
                submitted.append(list(ddls))

        con = StubJDBC(ctx, "jdbc:hive2://impala:21050/default")
        con.update_table_location("default", "people", people_parquet)
        assert len(submitted) == 1
        assert any("like parquet" in d for d in submitted[0])
        assert submitted[0][-1].startswith(
            "alter table people set location 'file:")

    def test_jdbc_secure_properties_resolved_and_combined(self, ctx):
        """MetastoreUtils.scala secureProperties semantics
        (TestMetastoreUtils.scala:15-77): secure values resolve through
        Hadoop's ``Configuration.getPassword`` and COMBINE with the plain
        properties (the plain ones win nothing — distinct keys); an empty
        secure map never consults the credential machinery."""
        from waimak_spark.operators.metastore import ImpalaJDBCConnector

        hconf = ctx.spark._jsc.hadoopConfiguration()
        # clear-text fallback is Configuration.getPassword's own
        # documented behavior — it stands in for a jceks entry here
        hconf.set("impala.secret.password", "sup3rs3cret")
        try:
            con = ImpalaJDBCConnector(
                ctx, "jdbc:hive2://impala:21050/default",
                properties={"user": "svc"},
                secure_properties={"impala.secret.password": "password"})
            assert con._all_properties() == {
                "user": "svc", "password": "sup3rs3cret"}
        finally:
            hconf.unset("impala.secret.password")

        # no secure properties: nothing consulted, plain map verbatim
        con = ImpalaJDBCConnector(
            ctx, "jdbc:hive2://impala:21050/default",
            properties={"user": "svc"})
        assert con._all_properties() == {"user": "svc"}

    def test_jdbc_secure_properties_error_paths(self, ctx, tmp_path):
        """Missing secure key: the error says whether a credential store
        was configured at all (MetastoreUtils.scala:106-121)."""
        from waimak_spark.dataflow.exceptions import DataFlowException
        from waimak_spark.operators.metastore import (
            CREDENTIAL_PROVIDER_PATH,
            ImpalaJDBCConnector,
        )

        hconf = ctx.spark._jsc.hadoopConfiguration()
        con = ImpalaJDBCConnector(
            ctx, "jdbc:hive2://impala:21050/default",
            secure_properties={"no.such.key": "password"})

        assert hconf.get(CREDENTIAL_PROVIDER_PATH) is None
        with pytest.raises(DataFlowException, match="no jceks file is set"):
            con._all_properties()

        # with a provider path configured (empty store), the message names
        # the searched locations instead
        hconf.set(CREDENTIAL_PROVIDER_PATH,
                  f"jceks://file{tmp_path}/creds.jceks")
        try:
            with pytest.raises(DataFlowException,
                               match="in any locations at"):
                con._all_properties()
        finally:
            hconf.unset(CREDENTIAL_PROVIDER_PATH)

    def test_commit_finish_submits_impala_ddls(self, spark, tmp_path):
        df = spark.createDataFrame([(1, "a")], "id int, name string")
        out = str(tmp_path / "out")
        flow = (Waimak.spark_flow(spark, str(tmp_path / "tmp"))
                .open("people", lambda c: df)
                .commit("c1", "people"))
        connector = ImpalaDummyConnector(flow.context)
        flow = flow.push("c1", ParquetDataCommitter(
            out, snapshot_folder="snap=1",
            metastore_connector=connector, metastore_db="default"))
        flow.execute()
        assert len(connector.ran_ddls) == 1
        ddls = connector.ran_ddls[0]
        assert any(d.startswith(
            "create external table if not exists people like parquet")
            for d in ddls)
        assert ddls[-1] == (
            f"alter table people set location 'file:{out}/people/snap=1'")


class TestImpalaTypeAmendment:
    """ImpalaUtils.scala:16-58 semantics, as native expressions."""

    def test_name_standardization(self):
        assert standardize_name_for_impala(" My Col-1 ") == "my_col_1"
        assert standardize_name_for_impala("rate%") == "rate_perc"
        assert standardize_name_for_impala("a'b.c/d") == "ab_c_d"

    def test_dates_cast_and_out_of_range_clamped(self, spark):
        df = spark.createDataFrame(
            [(date(2020, 1, 2), datetime(1200, 1, 1), datetime(2020, 6, 1),
              None)],
            "d date, early timestamp, ok timestamp, missing timestamp")
        out = amend_data_types_for_impala(df)
        assert [f.dataType.simpleString() for f in out.schema.fields] == \
            ["timestamp"] * 4
        row = out.collect()[0]
        assert row["d"] == datetime(2020, 1, 2)
        assert row["early"] == datetime(1400, 1, 1)  # clamped to low bound
        assert row["ok"] == datetime(2020, 6, 1)
        assert row["missing"] is None


class TestCommitIntegration:
    def test_commit_finish_submits_ddls(self, spark, tmp_path):
        df = spark.createDataFrame([(1, "a")], "id int, name string")
        out = str(tmp_path / "out")
        flow = (Waimak.spark_flow(spark, str(tmp_path / "tmp"))
                .open("people", lambda c: df)
                .commit("c1", "people"))
        connector = HiveDummyConnector(flow.context, "proddb")
        flow = flow.push("c1", ParquetDataCommitter(
            out, snapshot_folder="snap=1",
            metastore_connector=connector, metastore_db="proddb"))
        flow.execute()
        assert len(connector.ran_ddls) == 1
        ddls = connector.ran_ddls[0]
        assert any("create external table if not exists proddb.people"
                   in d for d in ddls)
        assert ddls[-1] == (
            f"alter table proddb.people set location '{out}/people/snap=1'")


class TestImpalaTimestampBounds:
    def test_last_day_and_low_bound_survive(self, spark):
        """9999-12-31 (any time of day) and exactly 1400-01-01 00:00 are
        inside Impala's supported range and must NOT be clamped; true
        out-of-range values clamp to the low bound."""
        from datetime import datetime

        from waimak_spark.operators.metastore import (
            amend_data_types_for_impala)

        df = spark.createDataFrame(
            [(1, datetime(9999, 12, 31, 12, 0, 0)),
             (2, datetime(1400, 1, 1, 0, 0, 0)),
             (3, datetime(1200, 1, 1, 0, 0, 0)),
             (4, None)],
            "id int, ts timestamp")
        got = {r.id: r.ts for r in amend_data_types_for_impala(df).collect()}
        assert got[1] == datetime(9999, 12, 31, 12, 0, 0)
        assert got[2] == datetime(1400, 1, 1, 0, 0, 0)
        assert got[3] == datetime(1400, 1, 1, 0, 0, 0)
        assert got[4] is None

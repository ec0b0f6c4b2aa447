"""Metastore DDL assertions via the dummy connector (the reference's
TestHiveDBConnector pattern: capture instead of submit)."""

import pytest

from waimak_spark.dataflow.spark_flow import Waimak
from waimak_spark.operators.commit import ParquetDataCommitter
from waimak_spark.operators.metastore import (
    HiveDummyConnector,
    FORCE_RECREATE_TABLES,
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

"""Coverage for source/sink variants the r1 verdict flagged untested:
open_table, snapshot-aware multi-label opens, debug_as_table,
write_hive_managed_table, write_partitioned_parquet."""

import os

import pytest
from pyspark.sql import functions as F

from waimak_spark.dataflow.spark_flow import Waimak


class TestSnapshotAwareOpen:
    def test_open_parquet_with_snapshot_folder(self, spark, tmp_path):
        df = spark.createDataFrame([(1, "a")], "id int, v string")
        base = str(tmp_path / "base")
        df.write.parquet(f"{base}/people/snap=20240101")
        df.withColumn("v", F.lit("b")).write.parquet(
            f"{base}/people/snap=20240202")
        flow = Waimak.spark_flow(spark).open_parquet(
            base, "people", snapshot_folder="snap=20240202")
        _, final = flow.execute()
        assert final.inputs.get("people").collect()[0]["v"] == "b"

    def test_open_parquet_output_prefix(self, spark, tmp_path):
        df = spark.createDataFrame([(1,)], "id int")
        base = str(tmp_path / "base2")
        df.write.parquet(f"{base}/t1")
        flow = Waimak.spark_flow(spark).open_parquet(
            base, "t1", output_prefix="raw")
        _, final = flow.execute()
        assert final.inputs.get("raw_t1").count() == 1

    def test_open_csv_defaults_header_inferschema(self, spark, tmp_path):
        path = tmp_path / "c" / "t.csv"
        path.parent.mkdir(parents=True)
        path.write_text("id,v\n1,x\n2,y\n")
        flow = Waimak.spark_flow(spark).open_file_csv(str(path), "t")
        _, final = flow.execute()
        df = final.inputs.get("t")
        assert df.schema["id"].dataType.simpleString() == "int"
        assert df.count() == 2


class TestTables:
    def test_hive_managed_write_then_open_table(self, spark, tmp_path):
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
        spark.sql("create database if not exists wmk_test_db")
        try:
            flow = (Waimak.spark_flow(spark)
                    .open("src", lambda c: df)
                    .write_hive_managed_table("wmk_test_db", "src",
                                              overwrite=True))
            flow.execute()
            flow2 = Waimak.spark_flow(spark).open_table(
                "wmk_test_db", "src", label_prefix="tbl")
            _, final = flow2.execute()
            assert final.inputs.get("tbl_src").count() == 2
        finally:
            spark.sql("drop database if exists wmk_test_db cascade")

    def test_debug_as_table_registers_views(self, spark):
        df = spark.createDataFrame([(7,)], "id int")
        flow = (Waimak.spark_flow(spark)
                .open("lbl", lambda c: df)
                .debug_as_table("lbl"))
        flow.execute()
        assert spark.sql("select id from lbl").collect()[0]["id"] == 7

    def test_write_partitioned_parquet_layout(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, "x"), (2, "x"), (3, "y")], "id int, part string")
        base = str(tmp_path / "pp")
        flow = (Waimak.spark_flow(spark)
                .open("t", lambda c: df)
                .write_partitioned_parquet(base, "t",
                                           partition_cols=["part"]))
        flow.execute()
        dirs = sorted(d for d in os.listdir(f"{base}/t")
                      if d.startswith("part="))
        assert dirs == ["part=x", "part=y"]
        assert spark.read.parquet(f"{base}/t").count() == 3


class TestBucketedTables:
    def test_cobucketed_join_has_no_shuffle(self, spark):
        """The point of bucketing: both sides bucketed on the join key with
        the same bucket count -> the join plan contains NO Exchange (the
        shuffle was paid once at write time)."""
        import pyspark.sql.functions as F

        facts = spark.createDataFrame(
            [(i % 50, float(i)) for i in range(1000)], "k int, v double")
        dims = spark.createDataFrame(
            [(i, f"d{i}") for i in range(50)], "k int, tag string")
        spark.sql("create database if not exists wmk_bkt_db")
        try:
            (Waimak.spark_flow(spark)
             .open("facts", lambda c: facts)
             .open("dims", lambda c: dims)
             .write_bucketed_table("wmk_bkt_db", "facts", ["k"], 4,
                                   sort_cols=["k"], overwrite=True)
             .write_bucketed_table("wmk_bkt_db", "dims", ["k"], 4,
                                   sort_cols=["k"], overwrite=True)
             .execute())
            t_f = spark.table("wmk_bkt_db.facts")
            t_d = spark.table("wmk_bkt_db.dims")
            # disable broadcast so the join would otherwise shuffle both sides
            with_conf = spark.conf
            old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
            with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                joined = t_f.join(t_d, "k")
                plan = joined._jdf.queryExecution().executedPlan().toString()
                assert "Exchange" not in plan, plan
                got = joined.groupBy("tag").agg(F.count("*").alias("n")).count()
                assert got == 50
            finally:
                with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        finally:
            spark.sql("drop database if exists wmk_bkt_db cascade")

    def test_refuses_overwrite_when_exists(self, spark):
        df = spark.createDataFrame([(1,)], "k int")
        spark.sql("create database if not exists wmk_bkt_db2")
        try:
            mk = lambda: (Waimak.spark_flow(spark)  # noqa: E731
                          .open("t", lambda c: df)
                          .write_bucketed_table("wmk_bkt_db2", "t", ["k"], 2)
                          .execute())
            mk()
            import pytest as _pt
            from waimak_spark.dataflow.exceptions import ActionException
            with _pt.raises(ActionException):
                mk()
        finally:
            spark.sql("drop database if exists wmk_bkt_db2 cascade")

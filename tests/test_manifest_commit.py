"""Manifest committer: rename-free commit protocol for object stores —
versioned one-file manifests as the atomic commit point, immobile data
dirs, version retirement."""

import pytest
from pyspark.sql import functions as F

from waimak_spark import Waimak
from waimak_spark.dataflow.exceptions import (
    DataFlowException,
    FlowValidationException,
)
from waimak_spark.filesystem import FileOps
from waimak_spark.operators.manifest_commit import (
    ManifestParquetDataCommitter,
    current_version,
    read_manifest_table,
)


def _commit_once(spark, tmp_path, out, value):
    df = spark.createDataFrame([(1, value)], "id int, v string")
    (Waimak.spark_flow(spark, str(tmp_path / "flowtmp"))
     .add_input("t", df)
     .commit("c", "t")
     .push("c", ManifestParquetDataCommitter(out, keep_versions=2))
     .execute())


class TestManifestCommit:
    def test_commit_and_read_back(self, spark, tmp_path):
        out = str(tmp_path / "out")
        _commit_once(spark, tmp_path, out, "a")
        got = read_manifest_table(spark, f"{out}/t").collect()
        assert [(r["id"], r["v"]) for r in got] == [(1, "a")]
        assert current_version(FileOps(spark), f"{out}/t") == 0

    def test_versions_advance_and_old_reads_work(self, spark, tmp_path):
        out = str(tmp_path / "out")
        _commit_once(spark, tmp_path, out, "a")
        _commit_once(spark, tmp_path, out, "b")
        ops = FileOps(spark)
        assert current_version(ops, f"{out}/t") == 1
        assert read_manifest_table(spark, f"{out}/t").collect()[0]["v"] == "b"
        # previous version still readable (time travel within keep window)
        assert read_manifest_table(spark, f"{out}/t",
                                   version=0).collect()[0]["v"] == "a"

    def test_retirement_deletes_old_data(self, spark, tmp_path):
        out = str(tmp_path / "out")
        for v in ["a", "b", "c", "d"]:  # keep_versions=2 → 0,1 retired
            _commit_once(spark, tmp_path, out, v)
        ops = FileOps(spark)
        assert current_version(ops, f"{out}/t") == 3
        with pytest.raises(Exception):
            read_manifest_table(spark, f"{out}/t", version=0)
        # newest still fine and only 2 data dirs remain
        assert read_manifest_table(spark, f"{out}/t").collect()[0]["v"] == "d"
        assert len(ops.list_dirs(f"{out}/t/_data")) == 2

    def test_no_manifest_raises(self, spark, tmp_path):
        with pytest.raises(DataFlowException, match="No committed manifest"):
            read_manifest_table(spark, str(tmp_path / "missing"))

    def test_empty_commit_rejected(self, spark, tmp_path):
        flow = (Waimak.spark_flow(spark, str(tmp_path / "flowtmp"))
                .push("c", ManifestParquetDataCommitter(str(tmp_path / "o"))))
        with pytest.raises(FlowValidationException):
            flow.execute()

    def test_works_without_flow_temp_folder(self, spark, tmp_path):
        # unlike ParquetDataCommitter, staging happens in the final bucket
        out = str(tmp_path / "out")
        df = spark.createDataFrame([(1, "x")], "id int, v string")
        (Waimak.spark_flow(spark)
         .add_input("t", df)
         .commit("c", "t")
         .push("c", ManifestParquetDataCommitter(out))
         .execute())
        assert read_manifest_table(spark, f"{out}/t").collect()[0]["v"] == "x"

    def test_partitioned_commit(self, spark, tmp_path):
        out = str(tmp_path / "out")
        df = spark.createDataFrame(
            [(1, "x", "p1"), (2, "y", "p2")], "id int, v string, p string")
        (Waimak.spark_flow(spark, str(tmp_path / "flowtmp"))
         .add_input("t", df)
         .commit("c", "t", partitions=["p"])
         .push("c", ManifestParquetDataCommitter(out))
         .execute())
        got = read_manifest_table(spark, f"{out}/t")
        assert got.where(F.col("p") == "p2").collect()[0]["v"] == "y"

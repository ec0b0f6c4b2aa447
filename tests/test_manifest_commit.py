"""Manifest committer: rename-free commit protocol for object stores —
one versioned commit-level manifest as the atomic commit point (covering
every label of a push), create-exclusive publication, immobile data dirs,
version retirement, corrupt-manifest-tolerant readers."""

import json

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


def _commit_once(spark, tmp_path, out, value, label="t"):
    df = spark.createDataFrame([(1, value)], "id int, v string")
    (Waimak.spark_flow(spark, str(tmp_path / "flowtmp"))
     .add_input(label, df)
     .commit("c", label)
     .push("c", ManifestParquetDataCommitter(out, keep_versions=2))
     .execute())


class TestManifestCommit:
    def test_commit_and_read_back(self, spark, tmp_path):
        out = str(tmp_path / "out")
        _commit_once(spark, tmp_path, out, "a")
        got = read_manifest_table(spark, out, "t").collect()
        assert [(r["id"], r["v"]) for r in got] == [(1, "a")]
        assert current_version(FileOps(spark), out) == 0

    def test_versions_advance_and_old_reads_work(self, spark, tmp_path):
        out = str(tmp_path / "out")
        _commit_once(spark, tmp_path, out, "a")
        _commit_once(spark, tmp_path, out, "b")
        ops = FileOps(spark)
        assert current_version(ops, out) == 1
        assert read_manifest_table(spark, out, "t").collect()[0]["v"] == "b"
        # previous version still readable (time travel within keep window)
        assert read_manifest_table(spark, out, "t",
                                   version=0).collect()[0]["v"] == "a"

    def test_retirement_deletes_old_data(self, spark, tmp_path):
        out = str(tmp_path / "out")
        for v in ["a", "b", "c", "d"]:  # keep_versions=2 → 0,1 retired
            _commit_once(spark, tmp_path, out, v)
        ops = FileOps(spark)
        assert current_version(ops, out) == 3
        with pytest.raises(Exception):
            read_manifest_table(spark, out, "t", version=0)
        # newest still fine and only 2 data dirs remain
        assert read_manifest_table(spark, out, "t").collect()[0]["v"] == "d"
        assert len(ops.list_dirs(f"{out}/t/_data")) == 2

    def test_no_manifest_raises(self, spark, tmp_path):
        with pytest.raises(DataFlowException, match="No committed manifest"):
            read_manifest_table(spark, str(tmp_path / "missing"), "t")

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
        assert read_manifest_table(spark, out, "t").collect()[0]["v"] == "x"

    def test_partitioned_commit(self, spark, tmp_path):
        out = str(tmp_path / "out")
        df = spark.createDataFrame(
            [(1, "x", "p1"), (2, "y", "p2")], "id int, v string, p string")
        (Waimak.spark_flow(spark, str(tmp_path / "flowtmp"))
         .add_input("t", df)
         .commit("c", "t", partitions=["p"])
         .push("c", ManifestParquetDataCommitter(out))
         .execute())
        got = read_manifest_table(spark, out, "t")
        assert got.where(F.col("p") == "p2").collect()[0]["v"] == "y"

    def test_multi_label_commit_is_one_manifest(self, spark, tmp_path):
        """All labels of a push land in ONE manifest file — multi-label
        publication is all-or-nothing, no partial-label state."""
        out = str(tmp_path / "out")
        d1 = spark.createDataFrame([(1, "x")], "id int, v string")
        d2 = spark.createDataFrame([(2, "y")], "id int, v string")
        (Waimak.spark_flow(spark, str(tmp_path / "flowtmp"))
         .add_input("t1", d1).add_input("t2", d2)
         .commit("c", "t1", "t2")
         .push("c", ManifestParquetDataCommitter(out))
         .execute())
        ops = FileOps(spark)
        assert current_version(ops, out) == 0
        assert len(ops.list_files(f"{out}/_manifests")) == 1
        assert read_manifest_table(spark, out, "t1").collect()[0]["v"] == "x"
        assert read_manifest_table(spark, out, "t2").collect()[0]["v"] == "y"

    def test_labels_carry_forward(self, spark, tmp_path):
        """A later commit of only one label keeps the other label readable
        at the newest version."""
        out = str(tmp_path / "out")
        _commit_once(spark, tmp_path, out, "x", label="t1")
        _commit_once(spark, tmp_path, out, "y", label="t2")
        ops = FileOps(spark)
        assert current_version(ops, out) == 1
        # newest manifest still resolves t1 (carried forward from v0)
        assert read_manifest_table(spark, out, "t1").collect()[0]["v"] == "x"
        assert read_manifest_table(spark, out, "t2").collect()[0]["v"] == "y"

    def test_sequential_commit_after_foreign_version_takes_next_slot(
            self, spark, tmp_path):
        """A commit arriving AFTER another writer published version 1
        simply targets version 2 — optimistic concurrency, no failure."""
        out = str(tmp_path / "out")
        _commit_once(spark, tmp_path, out, "a")
        ops = FileOps(spark)
        foreign = {"version": 1, "commit_uuid": "foreign", "commit_name": "w",
                   "labels": {"t": {"data_path": f"{out}/t/_data/x",
                                    "partitions": []}}}
        ops.write_string(f"{out}/_manifests/manifest-0000000001.json",
                         json.dumps(foreign))
        _commit_once(spark, tmp_path, out, "b")
        assert current_version(ops, out) == 2
        assert read_manifest_table(spark, out, "t").collect()[0]["v"] == "b"

    def test_inflight_winner_untouched_and_next_slot_used(self, spark,
                                                          tmp_path):
        """A winner's still-in-flight manifest at version 1 must never be
        overwritten; a commit arriving after it resolves to the NEXT slot
        (version 2) instead of retrying slot 1 forever. The slot-level
        no-overwrite guarantee itself lives in write_string_exclusive:
        of two writers that both resolved the same version, exactly one
        create succeeds."""
        out = str(tmp_path / "out")
        _commit_once(spark, tmp_path, out, "a")
        ops = FileOps(spark)
        ops.write_string(f"{out}/_manifests/manifest-0000000001.json",
                         "in-flight")
        _commit_once(spark, tmp_path, out, "b")  # lands at version 2
        assert ops.read_string(
            f"{out}/_manifests/manifest-0000000001.json") == "in-flight"
        assert current_version(ops, out) == 2
        # the create-exclusive primitive is what loses a REAL same-slot
        # race: it must refuse an existing destination
        assert ops.write_string_exclusive(
            f"{out}/_manifests/manifest-0000000001.json", "loser") is False
        assert ops.read_string(
            f"{out}/_manifests/manifest-0000000001.json") == "in-flight"

    def test_reader_skips_inflight_garbage_manifest(self, spark, tmp_path):
        """A manifest observed mid-write (created, content not yet flushed)
        parses as garbage; readers fall back to the previous version."""
        out = str(tmp_path / "out")
        _commit_once(spark, tmp_path, out, "a")
        ops = FileOps(spark)
        ops.write_string(f"{out}/_manifests/manifest-0000000001.json", "")
        assert current_version(ops, out) == 0
        assert read_manifest_table(spark, out, "t").collect()[0]["v"] == "a"


class TestCrashedWriterRecovery:
    def test_garbage_manifest_burns_version_instead_of_wedging(
            self, spark, tmp_path):
        """A writer that died between create-exclusive and flush leaves an
        unreadable manifest at version N; subsequent commits must target
        N+1 (burning N) rather than retrying N forever."""
        out = str(tmp_path / "out")
        _commit_once(spark, tmp_path, out, "v1")  # publishes version 0
        # simulate the crash: an empty (unparseable) manifest-1
        ops = FileOps(spark)
        ops.write_string(f"{out}/_manifests/manifest-{1:010d}.json", "")
        _commit_once(spark, tmp_path, out, "v2")  # must not wedge
        assert read_manifest_table(spark, out, "t").collect()[0]["v"] == "v2"
        assert current_version(ops, out) == 2

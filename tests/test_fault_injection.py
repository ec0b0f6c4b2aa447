"""Failure-semantics depth on the orchestrator (VERDICT r6 #4): the
reference's executor tests stress what happens AROUND a failure, not just
that one propagates — in-flight actions drain before the flow fails
(DataFlowExecutor.scala:138-157 processActionResults: the failed Try is
surfaced only after every submitted action's result is folded in), and a
failed run leaves its temp folder — including commit staging — on disk
(DataFlowExecutor.scala:22-52: finaliseExecution runs only on the
successful flow), so staged commit data is quarantined for recovery
instead of being half-deleted (TestSparkDataFlow.scala failure modes)."""

import os
import threading
import time

import pytest

from waimak_spark import Waimak
from waimak_spark.dataflow import (
    DataFlow,
    DataFlowException,
    ParallelDataFlowExecutor,
    SimpleAction,
)
from waimak_spark.operators.commit import ParquetDataCommitter

SF = "/root/testdata/sf0.001"


class TestParallelDrainThenFail:
    def test_in_flight_actions_drain_before_flow_fails(self):
        """Kill one action while another is mid-flight under the parallel
        scheduler: the executor must stop submitting NEW work immediately
        but let the in-flight action run to completion BEFORE raising —
        a Spark action mid-write would otherwise be abandoned with its
        job still running (DataFlowExecutor.scala:150-156)."""
        slow_started = threading.Event()
        release_slow = threading.Event()
        drained: list[str] = []
        late_ran: list[str] = []

        def slow(i, c):
            slow_started.set()
            assert release_slow.wait(timeout=10)
            # long enough that an executor raising without draining would
            # observably beat this append
            time.sleep(0.5)
            drained.append("slow")
            return [1]

        def boom(i, c):
            # guarantee slow is genuinely in flight when we fail
            assert slow_started.wait(timeout=10)
            release_slow.set()
            raise RuntimeError("nope")

        def late(i, c):
            late_ran.append("late")
            return [2]

        flow = (
            DataFlow()
            .add_action(SimpleAction([], ["s"], slow, name="slow"))
            .add_action(SimpleAction([], ["x"], boom, name="bad"))
            .add_action(SimpleAction(["s"], ["l"], late, name="late"))
        )
        with pytest.raises(DataFlowException, match="bad"):
            ParallelDataFlowExecutor(max_jobs=4).execute(flow)
        # the in-flight batch drained before the raise...
        assert drained == ["slow"]
        # ...but nothing newly-runnable was scheduled after the failure,
        # even though slow's success made `late` runnable
        assert late_ran == []

    def test_multiple_failures_report_the_first(self):
        """Two actions failing in the same drain window: the flow fails
        with the FIRST error off the completion queue; the second failure
        is drained, not raised over the first or lost."""
        gate = threading.Event()

        def boom_a(i, c):
            gate.wait(timeout=10)
            raise RuntimeError("first")

        def boom_b(i, c):
            gate.set()
            time.sleep(0.3)
            raise RuntimeError("second")

        flow = (
            DataFlow()
            .add_action(SimpleAction([], ["a"], boom_a, name="bad_a"))
            .add_action(SimpleAction([], ["b"], boom_b, name="bad_b"))
        )
        with pytest.raises(DataFlowException, match="bad_a"):
            ParallelDataFlowExecutor(max_jobs=4).execute(flow)


class TestCommitCrashQuarantine:
    def _flow(self, spark, tmp_path, committer):
        return (
            Waimak.spark_flow(spark, str(tmp_path / "flowtmp"))
            .open_file_parquet(f"{SF}/region.parquet", "region")
            .open_file_parquet(f"{SF}/nation.parquet", "nation")
            .commit("publish", "region", "nation")
            .push("publish", committer)
        )

    def test_failure_between_stage_and_move_quarantines_staging(
            self, spark, tmp_path):
        """Crash after stage, before move: the staged commit dir must
        survive on disk (finalise only runs on success — the reference's
        semantic), and nothing may reach the destination."""
        out = str(tmp_path / "out")
        tmp = str(tmp_path / "flowtmp")
        flow = self._flow(
            spark, tmp_path, ParquetDataCommitter(out, snapshot_folder="v1"))

        def crash(i, c):
            raise RuntimeError("crash between stage and move")

        # depends on the stage tag exactly like the move action does, so
        # it becomes runnable only after staging completes; the
        # sequential scheduler then picks it BEFORE the move because it
        # precedes the move in the action list (added at build time; the
        # commit expansion appends at prepare time)
        flow = flow.tag_dependency("commit_publish_stage")(
            lambda f: f.add_action(
                SimpleAction([], [], crash, name="crash_after_stage")))
        with pytest.raises(DataFlowException, match="crash_after_stage"):
            flow.execute()
        staged = [d for d in os.listdir(tmp) if d.startswith("commit-")]
        assert len(staged) == 1
        for label in ("region", "nation"):
            files = os.listdir(f"{tmp}/{staged[0]}/{label}")
            assert any(f.endswith(".parquet") for f in files)
        assert not os.path.exists(out)
        # the quarantined staging is readable data, not debris
        assert spark.read.parquet(f"{tmp}/{staged[0]}/region").count() == 5

    def test_mid_move_failure_keeps_unmoved_labels_staged(
            self, spark, tmp_path):
        """Move fails on the SECOND label (its destination appeared after
        validation — the concurrent-commit race the move-time recheck
        exists for): the already-moved label stays committed (per-label
        atomic rename), and the unmoved label's staged copy survives
        intact — never half-moved, never deleted by cleanup."""
        out = str(tmp_path / "out")
        tmp = str(tmp_path / "flowtmp")
        flow = self._flow(
            spark, tmp_path, ParquetDataCommitter(out, snapshot_folder="v1"))

        def sabotage(i, c):
            # simulates a concurrent committer winning the race for
            # nation's snapshot after this flow's prepare-time validation
            os.makedirs(f"{out}/nation/v1")
            return []

        flow = flow.tagged("commit_publish_stage")(
            lambda f: f.add_action(
                SimpleAction([], [], sabotage, name="concurrent_winner")))
        with pytest.raises(DataFlowException,
                           match=r"nation/v1\] already exists"):
            flow.execute()
        # region (first entry) committed atomically before the failure
        assert spark.read.parquet(f"{out}/region/v1").count() == 5
        # nation never reached the destination...
        assert os.listdir(f"{out}/nation/v1") == []
        # ...and its staged copy is quarantined, readable, complete
        staged = [d for d in os.listdir(tmp) if d.startswith("commit-")]
        assert len(staged) == 1
        assert spark.read.parquet(f"{tmp}/{staged[0]}/nation").count() == 25

    def test_rerun_after_crash_recovers_and_commits(self, spark, tmp_path):
        """The operational recovery story, end to end: a run that crashed
        between stage and move leaves quarantined staging; simply
        RE-RUNNING the flow must succeed with no manual cleanup — prepare
        wipes the stale staging, the commit lands at the destination,
        and the success path removes the temp folder."""
        out = str(tmp_path / "out")
        tmp = str(tmp_path / "flowtmp")
        crashed = self._flow(
            spark, tmp_path, ParquetDataCommitter(out, snapshot_folder="v1"))

        def crash(i, c):
            raise RuntimeError("crash between stage and move")

        crashed = crashed.tag_dependency("commit_publish_stage")(
            lambda f: f.add_action(
                SimpleAction([], [], crash, name="crash_after_stage")))
        with pytest.raises(DataFlowException):
            crashed.execute()
        assert [d for d in os.listdir(tmp) if d.startswith("commit-")]
        assert not os.path.exists(out)

        self._flow(spark, tmp_path,
                   ParquetDataCommitter(out, snapshot_folder="v1")).execute()
        assert spark.read.parquet(f"{out}/region/v1").count() == 5
        assert spark.read.parquet(f"{out}/nation/v1").count() == 25
        assert not os.path.exists(tmp)

    def test_temp_folder_survives_any_failed_flow(self, spark, tmp_path):
        """The base case of the quarantine semantic
        (TestSparkDataFlow.scala:867-880): ANY failed flow leaves its
        temp folder on disk, commit or not."""
        tmp = str(tmp_path / "flowtmp")

        def boom(c):
            raise RuntimeError("bad action")

        flow = Waimak.spark_flow(spark, tmp).open("bad", boom)
        with pytest.raises(DataFlowException, match="bad"):
            flow.execute()
        assert os.path.isdir(tmp)

    def test_stale_staging_cleaned_before_actions_run(self, spark,
                                                      tmp_path):
        """Leftovers from a previous (crashed) run are wiped at prepare
        time, BEFORE any action executes
        (TestSparkDataFlow.scala:796-820) — this is what bounds the
        quarantine semantic's disk usage across runs."""
        tmp = tmp_path / "flowtmp"
        (tmp / "commit-deadbeef").mkdir(parents=True)
        (tmp / "commit-deadbeef" / "junk.parquet").write_text("stale")
        spark.conf.set("spark.waimak.dataflow.removeTempAfterExecution",
                       "false")
        try:
            (Waimak.spark_flow(spark, str(tmp))
             .open_file_parquet(f"{SF}/region.parquet", "region")
             .execute())
            assert os.path.isdir(tmp)  # kept: conf disabled removal
            assert not os.path.exists(tmp / "commit-deadbeef")
        finally:
            spark.conf.unset("spark.waimak.dataflow.removeTempAfterExecution")

    def test_successful_run_still_cleans_temp(self, spark, tmp_path):
        """Regression guard for the success path: a clean run removes the
        temp folder (and the staging under it) exactly as before."""
        out = str(tmp_path / "out")
        tmp = str(tmp_path / "flowtmp")
        flow = self._flow(
            spark, tmp_path, ParquetDataCommitter(out, snapshot_folder="v1"))
        flow.execute()
        assert spark.read.parquet(f"{out}/region/v1").count() == 5
        assert spark.read.parquet(f"{out}/nation/v1").count() == 25
        assert not os.path.exists(tmp)

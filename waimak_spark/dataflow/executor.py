"""Flow executors: sequential and pool-parallel.

Re-expresses the reference's executor stack
(waimak-core/.../dataflow/DataFlowExecutor.scala:22-157,
ParallelActionScheduler.scala:50-145,
DFExecutorPriorityStrategies.scala:20-104):

* lifecycle = prepare → schedule loop → finalise;
* parallel scheduler: one thread pool per execution pool, ≤ max_jobs
  in flight; completed actions drain through a blocking queue;
* priority strategy ``race_to_outputs``: schedule "writers" (actions with
  no output labels) first because they force Spark DAG execution;
* any action failure fails the whole execute after in-flight actions
  drain (DataFlowExecutor.scala:150-156);
* error (default) or warning when actions never became runnable.
"""

from __future__ import annotations

import logging
import queue
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Callable, Optional, Sequence

from .action import DataFlowAction
from .exceptions import ActionException, DataFlowException
from .flow import DataFlow

logger = logging.getLogger("waimak_spark.executor")

PriorityStrategy = Callable[[list[DataFlowAction]], list[DataFlowAction]]


def race_to_outputs(actions: list[DataFlowAction]) -> list[DataFlowAction]:
    """Writers (no outputs) first, then actions that have inputs, then rest."""
    writers = [a for a in actions if not a.output_labels]
    with_inputs = [a for a in actions if a.output_labels and a.input_labels]
    rest = [a for a in actions if a.output_labels and not a.input_labels]
    return writers + with_inputs + rest


def prefer_loaders(actions: list[DataFlowAction]) -> list[DataFlowAction]:
    loaders = [a for a in actions if not a.input_labels]
    rest = [a for a in actions if a.input_labels]
    return loaders + rest


def as_added(actions: list[DataFlowAction]) -> list[DataFlowAction]:
    return actions


class FlowReporter:
    """Hook points around action execution (SparkFlowReporter equivalent)."""

    def action_started(self, action: DataFlowAction, flow: DataFlow) -> None:
        logger.info("Started: %s", action.description)

    def action_finished(self, action: DataFlowAction, flow: DataFlow) -> None:
        logger.info("Finished: %s", action.description)

    def action_failed(self, action: DataFlowAction, error: BaseException) -> None:
        logger.error("FAILED: %s: %r", action.description, error)


class DataFlowExecutor:
    """Base lifecycle: prepare → loop → finalise. Subclasses drive the loop."""

    def __init__(self, reporter: FlowReporter | None = None):
        self.reporter = reporter or FlowReporter()

    def execute(
        self, flow: DataFlow, error_on_unexecuted: bool = True
    ) -> tuple[list[DataFlowAction], DataFlow]:
        prepared = flow.prepare_for_execution()
        # finalise_execution (temp-folder removal) runs ONLY on success,
        # exactly like the reference (DataFlowExecutor.scala:22-52: the
        # loop result's .get throws BEFORE finaliseExecution): a failed
        # run must leave the temp folder — including any commit-<uuid>
        # staging written before the failure — quarantined on disk for
        # diagnosis and recovery, never half-deleted.  Accumulation is
        # bounded because prepare_for_execution wipes and recreates the
        # temp folder at the start of the NEXT run.
        executed, final = self._loop(prepared)
        if final.actions:
            msg = (
                f"There were actions not executed: "
                f"{[a.description for a in final.actions]}"
            )
            if error_on_unexecuted:
                raise DataFlowException(msg)
            logger.warning(msg)
        final.finalise_execution()
        return executed, final

    def _loop(self, flow: DataFlow) -> tuple[list[DataFlowAction], DataFlow]:
        raise NotImplementedError

    def _run_one(self, action: DataFlowAction, flow: DataFlow) -> list[Optional[Any]]:
        self.reporter.action_started(action, flow)
        # Spark UI attribution (SparkFlowContext.scala:24-26): every job an
        # action submits carries the action's guid as its job group and the
        # action description on the UI, cleared when the action finishes.
        # Local properties are per-thread, so parallel-pool actions each
        # tag their own jobs.
        spark = getattr(flow.context, "spark", None)
        if spark is not None:
            spark.sparkContext.setJobGroup(action.guid, action.description)
        try:
            inputs = flow.inputs.filter_labels(action.input_labels)
            out = action.perform_checked(inputs, flow.context)
        except Exception as e:  # noqa: BLE001 - report with action identity
            self.reporter.action_failed(action, e)
            raise ActionException(action.name, action.guid, e) from e
        finally:
            if spark is not None:
                # PySpark has no clearJobGroup; nulling the local
                # properties is what the JVM method does
                sc = spark.sparkContext
                sc.setLocalProperty("spark.jobGroup.id", None)
                sc.setLocalProperty("spark.job.description", None)
        self.reporter.action_finished(action, flow)
        return out


class SequentialDataFlowExecutor(DataFlowExecutor):
    """Single-threaded scheduler (reference SequentialScheduler semantics)."""

    def __init__(
        self,
        priority_strategy: PriorityStrategy = race_to_outputs,
        reporter: FlowReporter | None = None,
    ):
        super().__init__(reporter)
        self.priority_strategy = priority_strategy

    def _loop(self, flow: DataFlow) -> tuple[list[DataFlowAction], DataFlow]:
        executed: list[DataFlowAction] = []
        while True:
            runnable = self.priority_strategy(flow.next_runnable())
            if not runnable:
                return executed, flow
            action = runnable[0]
            outputs = self._run_one(action, flow)
            flow = flow.executed(action, outputs)
            executed.append(action)


class ParallelDataFlowExecutor(DataFlowExecutor):
    """Thread-pool scheduler with execution pools.

    Each pool gets its own ``ThreadPoolExecutor`` capped at ``max_jobs``
    threads; action bodies mostly release the GIL inside Py4J calls, so
    concurrent actions genuinely overlap Spark job submission. A worker
    thread sets ``spark.scheduler.pool`` before running its action when the
    flow context exposes a SparkSession (fair-scheduler mapping,
    SparkFlowContext.scala:23).
    """

    def __init__(
        self,
        max_jobs: int = 20,
        priority_strategy: PriorityStrategy = race_to_outputs,
        reporter: FlowReporter | None = None,
        pool_sizes: dict[str, int] | None = None,
    ):
        super().__init__(reporter)
        self.max_jobs = max_jobs
        self.priority_strategy = priority_strategy
        self.pool_sizes = pool_sizes or {}

    def _loop(self, flow: DataFlow) -> tuple[list[DataFlowAction], DataFlow]:
        executed: list[DataFlowAction] = []
        running: dict[str, DataFlowAction] = {}
        pools: dict[str, ThreadPoolExecutor] = {}
        in_flight_per_pool: dict[str, int] = {}
        done: "queue.Queue[tuple[DataFlowAction, Any, BaseException | None]]" = queue.Queue()
        first_error: BaseException | None = None
        lock = threading.Lock()

        def pool_for(name: str) -> ThreadPoolExecutor:
            if name not in pools:
                size = self.pool_sizes.get(name, self.max_jobs)
                pools[name] = ThreadPoolExecutor(
                    max_workers=size, thread_name_prefix=f"waimak-{name}"
                )
                in_flight_per_pool[name] = 0
            return pools[name]

        def submit(action: DataFlowAction, fl: DataFlow) -> None:
            def work() -> None:
                try:
                    self._set_spark_pool(fl, action.pool)
                    out = self._run_one(action, fl)
                    done.put((action, out, None))
                except BaseException as e:  # noqa: BLE001
                    done.put((action, None, e))

            running[action.guid] = action
            with lock:
                in_flight_per_pool[action.pool] = in_flight_per_pool.get(action.pool, 0) + 1
            pool_for(action.pool).submit(work)

        try:
            while True:
                if first_error is None:
                    free_pools = {
                        p
                        for p in set(in_flight_per_pool)
                        | {a.pool for a in flow.actions}
                        if in_flight_per_pool.get(p, 0)
                        < self.pool_sizes.get(p, self.max_jobs)
                    }
                    candidates = [
                        a
                        for a in self.priority_strategy(flow.next_runnable(free_pools))
                        if a.guid not in running
                    ]
                    for a in candidates:
                        if in_flight_per_pool.get(a.pool, 0) >= self.pool_sizes.get(
                            a.pool, self.max_jobs
                        ):
                            continue
                        submit(a, flow)
                if not running:
                    if first_error is not None:
                        raise first_error
                    return executed, flow
                action, outputs, error = done.get()
                del running[action.guid]
                with lock:
                    in_flight_per_pool[action.pool] -= 1
                if error is not None:
                    # drain remaining in-flight actions, then fail
                    if first_error is None:
                        first_error = error
                    continue
                flow = flow.executed(action, outputs)
                executed.append(action)
        finally:
            for p in pools.values():
                p.shutdown(wait=False)

    @staticmethod
    def _set_spark_pool(flow: DataFlow, pool: str) -> None:
        spark = getattr(flow.context, "spark", None)
        if spark is not None and pool != "DEFAULT":
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)

"""Property-based DAG mechanics tests (hypothesis): for arbitrary valid
action graphs the executor runs every action exactly once in dependency
order; for arbitrary graphs with a cycle, validation rejects the flow."""

from hypothesis import given, settings, strategies as st

import pytest

from waimak_spark.dataflow import (
    DataFlow,
    FlowValidationException,
    ParallelDataFlowExecutor,
    SequentialDataFlowExecutor,
    SimpleAction,
)


def dag_strategy(max_nodes=8):
    """Random DAG: node i may depend on any subset of earlier nodes'
    outputs (labels "L0".."L{i-1}") — acyclic by construction."""

    @st.composite
    def build(draw):
        n = draw(st.integers(min_value=1, max_value=max_nodes))
        deps = []
        for i in range(n):
            pool = list(range(i))
            chosen = draw(st.lists(st.sampled_from(pool), unique=True,
                                   max_size=min(i, 3))) if pool else []
            deps.append(sorted(chosen))
        return deps

    return build()


def flow_from(deps, record):
    flow = DataFlow()
    for i, ds in enumerate(deps):
        ins = [f"L{j}" for j in ds]

        def body(inputs, _c, i=i, ins=ins):
            record.append(i)
            # inputs must already hold every dependency's output
            assert all(inputs[l] == l for l in ins)
            return [f"L{i}"]

        flow = flow.add_action(
            SimpleAction(ins, [f"L{i}"], body, name=f"a{i}"))
    return flow


@settings(max_examples=60, deadline=None)
@given(deps=dag_strategy())
def test_sequential_runs_all_in_dependency_order(deps):
    record = []
    executed, final = flow_from(deps, record).execute(
        SequentialDataFlowExecutor())
    assert sorted(record) == list(range(len(deps)))  # each exactly once
    pos = {i: p for p, i in enumerate(record)}
    for i, ds in enumerate(deps):
        for d in ds:
            assert pos[d] < pos[i], f"{d} must run before {i}"
    assert not final.actions


@settings(max_examples=25, deadline=None)
@given(deps=dag_strategy())
def test_parallel_runs_all_in_dependency_order(deps):
    record = []  # GIL-safe appends
    executed, final = flow_from(deps, record).execute(
        ParallelDataFlowExecutor(max_jobs=4))
    assert sorted(record) == list(range(len(deps)))
    pos = {i: p for p, i in enumerate(record)}
    for i, ds in enumerate(deps):
        for d in ds:
            assert pos[d] < pos[i]
    assert not final.actions


@settings(max_examples=40, deadline=None)
@given(deps=dag_strategy(max_nodes=6),
       edge=st.tuples(st.integers(0, 5), st.integers(0, 5)))
def test_cycle_always_rejected(deps, edge):
    """Adding a back-edge (earlier node consumes a later node's output)
    must either be a valid forward edge or fail validation — never an
    executed cycle."""
    lo, hi = sorted((edge[0] % len(deps), edge[1] % len(deps)))
    if lo == hi:
        return
    # rebuild, but node `lo` additionally consumes L{hi} (back-edge)
    flow = DataFlow()
    try:
        for i, ds in enumerate(deps):
            ins = [f"L{j}" for j in ds]
            if i == lo:
                ins = sorted(set(ins) | {f"L{hi}"})
            flow = flow.add_action(SimpleAction(
                ins, [f"L{i}"], lambda _i, _c, i=i: [f"L{i}"], name=f"a{i}"))
        flow.validate()
    except FlowValidationException:
        return  # correctly rejected
    # if validation passed, executing must complete without deadlock and
    # the back-edge must not actually be a cycle (hi reachable from lo)
    executed, final = flow.execute()
    assert not final.actions


@settings(max_examples=25, deadline=None)
@given(deps=dag_strategy(), data=st.data())
def test_parallel_random_failures_drain_and_never_run_downstream(deps, data):
    """Randomized version of the drain-then-fail scenarios in
    test_fault_injection.py (DataFlowExecutor.scala:138-157): for an
    arbitrary DAG with an arbitrary failing subset, (1) execute() never
    returns or raises while an action body is still in flight (every
    started body has ended), (2) nothing downstream of a failing action
    ever starts, (3) the run fails iff some failing action is actually
    reachable (not itself downstream of another failure), and (4) the
    executed list is exactly the started non-failing actions."""
    import threading

    from waimak_spark.dataflow import DataFlowException

    n = len(deps)
    fail = set(data.draw(st.lists(st.integers(0, n - 1), unique=True),
                         label="fail"))
    started: list[int] = []
    ended: list[int] = []
    lock = threading.Lock()

    flow = DataFlow()
    for i, ds in enumerate(deps):
        ins = [f"L{j}" for j in ds]

        def body(_inputs, _c, i=i):
            with lock:
                started.append(i)
            try:
                if i in fail:
                    raise RuntimeError(f"boom{i}")
                return [f"L{i}"]
            finally:
                with lock:
                    ended.append(i)

        flow = flow.add_action(
            SimpleAction(ins, [f"L{i}"], body, name=f"a{i}"))

    # transitive downstream-of-failure set
    down: set[int] = set()
    changed = True
    while changed:
        changed = False
        for i, ds in enumerate(deps):
            if i not in down and any(d in fail or d in down for d in ds):
                down.add(i)
                changed = True

    try:
        executed, _final = flow.execute(ParallelDataFlowExecutor(max_jobs=3))
        failed = False
        executed_names = {a.name for a in executed}
    except DataFlowException:
        failed = True

    assert sorted(started) == sorted(ended)          # (1) drained
    assert not (set(started) & down)                 # (2) downstream never ran
    root_fails = fail - down
    assert failed == bool(root_fails)                # (3)
    if not failed:
        assert sorted(started) == list(range(n))
        assert executed_names == {f"a{i}" for i in range(n)}  # (4)


@settings(max_examples=15, deadline=None)
@given(deps=dag_strategy(), data=st.data())
def test_parallel_pool_capacity_never_exceeded(deps, data):
    """Per-pool in-flight caps hold under arbitrary DAGs and pool
    assignments (ParallelActionScheduler.scala:50-86 availableExecutionPool
    semantics): with pool_sizes {"one": 1, "two": 2}, the observed
    concurrent body count per pool never exceeds its cap."""
    import threading
    import time

    caps = {"one": 1, "two": 2}
    pools = [data.draw(st.sampled_from(sorted(caps)), label=f"pool{i}")
             for i in range(len(deps))]
    inflight = {p: 0 for p in caps}
    peak = {p: 0 for p in caps}
    lock = threading.Lock()

    flow = DataFlow()
    for i, ds in enumerate(deps):
        ins = [f"L{j}" for j in ds]

        def body(_inputs, _c, i=i, p=pools[i]):
            with lock:
                inflight[p] += 1
                peak[p] = max(peak[p], inflight[p])
            time.sleep(0.002)  # force overlap so the cap is actually probed
            with lock:
                inflight[p] -= 1
            return [f"L{i}"]

        # pool assignment must go through the flow's execution_pool scope:
        # add_action STAMPS the active pool onto the action (a bare
        # ``action.pool = ...`` before add_action is overwritten — this
        # property caught exactly that)
        action = SimpleAction(ins, [f"L{i}"], body, name=f"a{i}")
        flow = flow.execution_pool(pools[i])(
            lambda f, a=action: f.add_action(a))

    executed, final = flow.execute(
        ParallelDataFlowExecutor(max_jobs=8, pool_sizes=caps))
    assert not final.actions
    assert len(executed) == len(deps)
    for p, cap in caps.items():
        assert peak[p] <= cap, f"pool {p} peaked at {peak[p]} > cap {cap}"


def test_hypothesis_available():
    # guard: the suite genuinely ran property tests (import worked)
    import hypothesis

    assert hypothesis.__version__

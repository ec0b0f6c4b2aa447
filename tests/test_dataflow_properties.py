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


def test_hypothesis_available():
    # guard: the suite genuinely ran property tests (import worked)
    import hypothesis

    assert hypothesis.__version__

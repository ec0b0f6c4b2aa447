"""Property-based lock for the restructured resolve fixpoint (round 5:
self-loop edges, seeded labels, observe-based convergence, 2 hops per
round): for ARBITRARY small random graphs the canonical assignment must
equal the true connected-component minimum computed by a plain Python
BFS — whatever the component shapes (chains, stars, cliques, isolates)."""

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F  # noqa: F401  (spark fixture import path)

from waimak_spark.functions.similarity import resolve_duplicates_fixpoint

SPARK_SETTINGS = settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture])


def _reference_components(n_ids: int, edges: list[tuple[int, int]]):
    """Canonical-per-id via union-find — the ground truth."""
    parent = list(range(n_ids))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n_ids)}


@given(
    n_ids=st.integers(min_value=1, max_value=24),
    edge_picks=st.lists(
        st.tuples(st.integers(0, 23), st.integers(0, 23)), max_size=40),
    # both resolve paths: the default hybrid takes the driver-side
    # union-find at these sizes; local_max_edges=0 forces the
    # distributed min-label loop — both must equal the reference
    local_max_edges=st.sampled_from([0, None]),
)
@SPARK_SETTINGS
def test_fixpoint_matches_union_find(spark, n_ids, edge_picks,
                                     local_max_edges):
    edges = [(a % n_ids, b % n_ids) for a, b in edge_picks
             if a % n_ids != b % n_ids]
    expected = _reference_components(n_ids, edges)

    ids = spark.createDataFrame([(i,) for i in range(n_ids)], "id long")
    if edges:
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    else:
        pairs = spark.createDataFrame([], "id_a long, id_b long")
    kwargs = ({} if local_max_edges is None
              else {"local_max_edges": local_max_edges})
    out = {r["id"]: r["canonical_id"]
           for r in resolve_duplicates_fixpoint(ids, pairs,
                                                **kwargs).collect()}
    assert out == expected

"""Property-based connected-components parity: random edge sets vs a
Python union-find reference.  The iterative min-label propagation
(functions/pipeline.connected_components) must assign every node the
minimum node id of its component regardless of graph shape (chains,
stars, cycles, isolated nodes)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tiledb_mariadb_spark.functions.pipeline import connected_components

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=19),
        st.integers(min_value=0, max_value=19),
    ),
    min_size=0,
    max_size=25,
)


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in range(n_nodes)}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edges_strategy)
def test_cc_matches_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    n = 20
    nodes_df = spark.range(n).selectExpr("id AS node")
    if edges:
        edges_df = spark.createDataFrame(edges, "a long, b long")
    else:
        edges_df = spark.createDataFrame([], "a long, b long")
    got = {
        r["node"]: r["cluster"]
        for r in connected_components(edges_df, nodes_df).collect()
    }
    want = _union_find(n, edges)
    assert got == want, f"edges={edges}"

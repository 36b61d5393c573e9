"""Connected-components correctness vs a union-find oracle on seeded
random graphs (SURVEY.md §7 step 5)."""

import numpy as np
import pytest

from smqtk_indexing_spark.operators.cluster import connected_components


def _truth_labels(n_nodes, edges):
    """Union-find ground truth, min-id canonical labels."""
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
    return {i: find(i) for i in range(n_nodes)}


@pytest.mark.parametrize("cap", [2_000_000, 0])  # driver union-find / distributed star
@pytest.mark.parametrize("seed,n,m", [(1, 30, 20), (2, 100, 80), (3, 200, 300)])
def test_cc_matches_union_find(spark, seed, n, m, cap):
    rng = np.random.default_rng(seed)
    edges = {
        (int(min(a, b)), int(max(a, b)))
        for a, b in rng.integers(0, n, size=(m, 2))
        if a != b
    }
    e = spark.createDataFrame(sorted(edges), "a long, b long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(e, nodes=nodes, driver_edge_cap=cap).collect()
    }
    want = _truth_labels(n, edges)
    assert got == want


def test_cc_chain_and_singletons(spark):
    # a long path graph stresses the O(log n) convergence (distributed
    # path forced: the driver fast path has no round structure to stress)
    chain = [(i, i + 1) for i in range(0, 63)]
    e = spark.createDataFrame(chain, "a long, b long")
    nodes = spark.createDataFrame([(i,) for i in range(70)], "doc_id long")
    got = {r.doc_id: r.cluster_id for r in connected_components(
        e, nodes=nodes, driver_edge_cap=0).collect()}
    for i in range(64):
        assert got[i] == 0
    for i in range(64, 70):
        assert got[i] == i


def test_cc_no_edges(spark):
    e = spark.createDataFrame([], "a long, b long")
    nodes = spark.createDataFrame([(5,), (9,)], "doc_id long")
    got = {r.doc_id: r.cluster_id for r in connected_components(e, nodes=nodes).collect()}
    assert got == {5: 5, 9: 9}

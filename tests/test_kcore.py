"""k-core peel (operators/graph.py::k_core): clique-vs-chain
separation, the fixed-iteration convergence contract, and the dirty-
edge canonicalization shared with the rest of the graph family.
"""

import pytest

from yelp_review_data_analysis_using_big_data_technologies_spark.operators.graph import k_core


def _pairs(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )


def _run(spark, edges, **kw):
    return {
        r.id: r.degree for r in k_core(_pairs(spark, edges), **kw).collect()
    }


def test_triangle_survives_chain_peels(spark):
    # triangle 1-2-3 plus chain 10-11-12: the chain has no 2-core
    got = _run(spark, [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12)])
    assert got == {1: 2, 2: 2, 3: 2}


def test_star_fully_peels(spark):
    # hub + 5 leaves: leaves are degree-1, then the hub is isolated
    assert _run(spark, [(0, i) for i in range(1, 6)]) == {}


def test_bridge_between_cliques_peels_but_cliques_stay(spark):
    k4a = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    k4b = [(a, b) for a in range(11, 15) for b in range(a + 1, 15)]
    got = _run(spark, k4a + k4b + [(4, 11)], k=3)
    # both K4s survive; the bridge edge survives TOO (k-core keeps
    # every edge between core nodes), so its endpoints report 4
    assert got == {1: 3, 2: 3, 3: 3, 4: 4, 11: 4, 12: 3, 13: 3, 14: 3}


def test_k1_keeps_every_edge_endpoint(spark):
    got = _run(spark, [(1, 2), (3, 4)], k=1)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_fixed_iterations_report_residual_degree(spark):
    # a 20-node path peels 2 nodes per round; after 3 rounds the
    # middle 14 remain UNCONVERGED and report their residual degree —
    # the documented fixed-iteration contract (more rounds finish it)
    path = [(i, i + 1) for i in range(20)]
    got = _run(spark, path, k=2, iterations=3)
    assert set(got) == set(range(3, 18))
    assert got[3] == 1 and got[10] == 2
    assert _run(spark, path, k=2, iterations=11) == {}


def test_dirty_edges_canonicalize(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (None, 2), (3, None)],
        "id_a long, id_b long",
    )
    got = {r.id: r.degree for r in k_core(pairs).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_validation(spark):
    with pytest.raises(ValueError):
        k_core(_pairs(spark, [(1, 2)]), k=0)
    with pytest.raises(ValueError):
        k_core(_pairs(spark, [(1, 2)]), iterations=0)

"""Fixed-iteration PageRank (operators/graph.py).

Pins: brute-force equivalence against a pure-python reference on
randomized graphs (the join/agg formulation has plenty of
silent-wrong surface: degree on the wrong side, missed symmetrize,
per-iteration rounding), rank-mass conservation (no dangling nodes on
a symmetrized pair relation ⇒ Σr = 1), the DuckDB unrolled twin,
self-loop/NULL hygiene, and partition invariance.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import release_staging
from yelp_review_data_analysis_using_big_data_technologies_spark.operators.graph import pagerank, pagerank_sql

ITERS = 5
D = 0.85


def _brute(pairs, iterations=ITERS, damping=D):
    edges = {}
    for a, b in pairs:
        if a is None or b is None or a == b:
            continue
        edges.setdefault(a, set()).add(b)
        edges.setdefault(b, set()).add(a)
    nodes = sorted(edges)
    n = len(nodes)
    if n == 0:
        return []
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        nxt = {}
        for v in nodes:
            s = sum(r[u] / len(edges[u]) for u in edges[v])
            nxt[v] = (1 - damping) / n + damping * s
        r = nxt
    out = [(v, len(edges[v]), round(r[v], 6)) for v in nodes]
    return sorted(out, key=lambda t: (-t[2], t[0]))


def _spark_pr(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    try:
        return [tuple(r) for r in pagerank(df, **kw).collect()]
    finally:
        release_staging()


def _rand_pairs(seed, n_nodes, n_edges):
    rng = random.Random(seed)
    seen = set()
    while len(seen) < n_edges:
        a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if a != b:
            seen.add((min(a, b), max(a, b)))
    return sorted(seen)


def test_path_ends_rank_below_middles(spark):
    # P4 path 0-1-2-3: interior nodes receive from two sides, ends
    # from one — a shape with REAL rank asymmetry (regular components
    # like cliques all converge to the uniform 1/N, so they can't
    # distinguish a broken update rule from a correct one)
    path = [(0, 1), (1, 2), (2, 3)]
    got = _spark_pr(spark, path)
    assert got == _brute(path)
    ranks = dict((v, r) for v, _, r in got)
    assert ranks[1] > ranks[0] and ranks[2] > ranks[3]


def test_star_center_dominates(spark):
    star = [(0, i) for i in range(1, 9)]
    got = _spark_pr(spark, star)
    assert got == _brute(star)
    assert got[0][0] == 0  # hub ranks first


def test_brute_force_randomized(spark):
    for seed in (1, 2, 3):
        pairs = _rand_pairs(seed, n_nodes=30, n_edges=60)
        assert _spark_pr(spark, pairs) == _brute(pairs)


def test_rank_mass_conserved(spark):
    pairs = _rand_pairs(9, n_nodes=25, n_edges=50)
    got = _spark_pr(spark, pairs)
    assert abs(sum(r for _, _, r in got) - 1.0) < 1e-4


def test_self_loops_and_nulls_dropped(spark):
    rows = [(1, 2), (2, 3), (4, 4), (None, 5), (6, None)]
    got = _spark_pr(spark, rows)
    assert got == _brute(rows)
    assert {v for v, _, _ in got} == {1, 2, 3}


def test_twin_matches_brute_force():
    pairs = _rand_pairs(7, n_nodes=20, n_edges=35)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE p AS SELECT * FROM (VALUES "
        + ", ".join("(?, ?)" for _ in pairs)
        + ") AS t(id_a, id_b)",
        [x for pr in pairs for x in pr],
    )
    got = [
        tuple(r)
        for r in con.execute(
            pagerank_sql("SELECT id_a, id_b FROM p")
        ).fetchall()
    ]
    assert got == _brute(pairs)


def test_validation():
    import pyspark.sql.functions as F  # noqa: F401

    with pytest.raises(ValueError, match="iterations"):
        pagerank(None, iterations=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(None, damping=1.5)


def test_partition_invariance(spark):
    pairs = _rand_pairs(5, n_nodes=22, n_edges=44)
    want = None
    for parts in (1, 3, 17):
        df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint").repartition(
            parts
        )
        try:
            got = [tuple(r) for r in pagerank(df).collect()]
        finally:
            release_staging()
        if want is None:
            want = got
        else:
            assert got == want, f"ranks differ at {parts} partitions"


@pytest.mark.parametrize("iters", [1, 8])
def test_twin_unroller_other_iteration_counts(iters):
    pairs = _rand_pairs(4, n_nodes=15, n_edges=25)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE p AS SELECT * FROM (VALUES "
        + ", ".join("(?, ?)" for _ in pairs)
        + ") AS t(id_a, id_b)",
        [x for pr in pairs for x in pr],
    )
    got = [
        tuple(r)
        for r in con.execute(
            pagerank_sql("SELECT id_a, id_b FROM p", iterations=iters)
        ).fetchall()
    ]
    assert got == _brute(pairs, iterations=iters)


def test_checkpointing_is_transparent(spark):
    pairs = _rand_pairs(6, n_nodes=20, n_edges=35)
    df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    try:
        plain = [tuple(r) for r in pagerank(df).collect()]
        staged = [
            tuple(r) for r in pagerank(df, checkpoint_every=2).collect()
        ]
    finally:
        release_staging()
    assert plain == staged

"""Injection class (r10): ADVERSARIAL GRAPH TOPOLOGIES through the
graph family (operators/graph.py PageRank, llm/clusters.py both CC
algorithms, and the documents-induced composition entries).

The r9 graph operators were hash-verified on the near-dup graphs the
bench corpus happens to produce — dense clique-ish blobs.  This suite
pins the shapes those corpora never exercise:

* a PATH with diameter 9 > K=5 PageRank iterations (rank asymmetry:
  the K-step twin must agree step-for-step even though rank has NOT
  converged — ends vs middle differ, and a convergence-style
  implementation would diverge from the unrolled twin);
* STAR-OF-STARS (the alternating large-star/small-star worst case:
  two levels of hubs force both star moves repeatedly);
* a COMPLETE BIPARTITE near-dup graph (no odd cycles — rank
  oscillates between the two sides before damping settles it);
* the SAME EDGE REPEATED with swapped endpoints (must normalize to
  ONE undirected edge — degree 1, no double-counted contribution);
* disjoint 2-NODE CLIQUES (the minimum cluster size that can exist:
  every dedup decision boundary fires at once);
* a LONG CHAIN over DOCUMENTS (shifted-window texts whose banded
  near-dup graph IS a path) through the real entry twins — pair
  generation, PageRank, both CC algorithms, and keep-central agree
  with DuckDB end to end on an asymmetric topology.

Every fixture is compared cross-engine against the SAME SQL twins the
driver hashes (pagerank_sql / connected_components_sql over a literal
VALUES edge relation), plus direct pins of the structural facts.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from yelp_review_data_analysis_using_big_data_technologies_spark.llm.clusters import (
    connected_components,
    connected_components_alternating,
    connected_components_sql,
    label_propagation,
    label_propagation_sql,
)
from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import release_staging
from yelp_review_data_analysis_using_big_data_technologies_spark.operators.graph import pagerank, pagerank_sql
from yelp_review_data_analysis_using_big_data_technologies_spark.sources.readers import TABLES

PATH10 = [(i, i + 1) for i in range(1, 10)]
STAR_OF_STARS = [
    (1, 2), (1, 3), (1, 4),          # hub → sub-hubs
    (2, 5), (2, 6), (3, 7), (3, 8), (4, 9), (4, 10),  # sub-hub → leaves
]
BIPARTITE_K34 = [(a, b) for a in (1, 2, 3) for b in (4, 5, 6, 7)]
SWAPPED_EDGE = [(1, 2), (2, 1)]
REPEATED_EDGE = [(1, 2), (1, 2), (1, 2)]
DYADS = [(1, 2), (3, 4), (5, 6)]

TOPOLOGIES = {
    "path10": PATH10,
    "star_of_stars": STAR_OF_STARS,
    "bipartite_k34": BIPARTITE_K34,
    "swapped_edge": SWAPPED_EDGE,
    "repeated_edge": REPEATED_EDGE,
    "dyads": DYADS,
}


def _pairs_df(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def _values_sql(edges):
    rows = ", ".join(f"({a}, {b})" for a, b in edges)
    return f"SELECT * FROM (VALUES {rows}) AS __t(id_a, id_b)"


@pytest.mark.parametrize("name", sorted(TOPOLOGIES))
def test_pagerank_twin_agrees(spark, name):
    edges = TOPOLOGIES[name]
    got = sorted(
        (r.id, r.degree, r.rank) for r in pagerank(_pairs_df(spark, edges)).collect()
    )
    release_staging()
    want = sorted(
        tuple(r)
        for r in duckdb.connect()
        .execute(pagerank_sql(_values_sql(edges)))
        .fetchall()
    )
    assert got == want, f"pagerank diverged on {name}"


@pytest.mark.parametrize("name", sorted(TOPOLOGIES))
def test_cc_both_algorithms_match_twin(spark, name):
    edges = TOPOLOGIES[name]
    df = _pairs_df(spark, edges)
    got_min = sorted(
        (r.doc_id, r.cluster_id)
        for r in connected_components(df).collect()
    )
    got_star = sorted(
        (r.doc_id, r.cluster_id)
        for r in connected_components_alternating(df).collect()
    )
    release_staging()
    want = sorted(
        tuple(r)
        for r in duckdb.connect()
        .execute(connected_components_sql(_values_sql(edges)))
        .fetchall()
    )
    assert got_min == want, f"min-label CC diverged on {name}"
    assert got_star == want, f"alternating-star CC diverged on {name}"


@pytest.mark.parametrize("name", sorted(TOPOLOGIES))
def test_label_propagation_twin_agrees(spark, name):
    edges = TOPOLOGIES[name]
    got = sorted(
        (r.doc_id, r.community_id)
        for r in label_propagation(_pairs_df(spark, edges)).collect()
    )
    release_staging()
    want = sorted(
        tuple(r)
        for r in duckdb.connect()
        .execute(label_propagation_sql(_values_sql(edges)))
        .fetchall()
    )
    assert got == want, f"label propagation diverged on {name}"


def test_label_propagation_bridge_does_not_merge_cliques(spark):
    """THE property that distinguishes LPA communities from connected
    components: two K4 cliques joined by ONE bridge edge are a single
    CC component but two LPA communities — the bridge cannot out-vote
    either dense neighborhood."""
    k4a = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    k4b = [(a, b) for a in range(11, 15) for b in range(a + 1, 15)]
    bridge = [(4, 11)]
    df = _pairs_df(spark, k4a + k4b + bridge)
    cc = {r.cluster_id for r in connected_components(df).collect()}
    assert cc == {1}, "CC must see one component"
    lpa = {
        r.doc_id: r.community_id for r in label_propagation(df).collect()
    }
    release_staging()
    assert set(lpa[i] for i in range(1, 5)) == {1}
    assert set(lpa[i] for i in range(11, 15)) == {11}


def test_label_propagation_clique_collapses_to_min_label(spark):
    k5 = [(a, b) for a in range(3, 8) for b in range(a + 1, 8)]
    lpa = {
        r.doc_id: r.community_id
        for r in label_propagation(_pairs_df(spark, k5)).collect()
    }
    release_staging()
    assert set(lpa.values()) == {3} and len(lpa) == 5


def test_path_rank_is_asymmetric_and_symmetric_about_center(spark):
    """Diameter 9 > K=5: rank must NOT be uniform (a clique-regular
    assumption would wrongly flatten it) and must be mirror-symmetric
    about the path's center.  At K=5 the profile is the
    PRE-CONVERGENCE parity wave — the endpoint-adjacent node is the
    global peak (its degree-1 neighbor donates its ENTIRE rank each
    step: 0.1237 > interior 0.1019-0.1081) and the endpoints are the
    strict minimum (0.0617) — exactly what the unrolled twin computes
    and a converged implementation would NOT."""
    out = {r.id: r.rank for r in pagerank(_pairs_df(spark, PATH10)).collect()}
    release_staging()
    for i in range(1, 6):
        assert out[i] == out[11 - i], f"mirror break at {i}"
    interior = [out[i] for i in range(2, 10)]
    assert max(interior) == out[2], "endpoint-adjacent node is the peak"
    assert out[1] < min(interior), "endpoints are the strict minimum"
    assert len(set(out.values())) > 1, "path rank cannot be uniform"


def test_swapped_and_repeated_edges_normalize_to_one(spark):
    """(1,2) + (2,1) (and verbatim repeats) are ONE undirected edge:
    degree 1 on both endpoints, rank split evenly, one 2-node
    cluster."""
    for edges in (SWAPPED_EDGE, REPEATED_EDGE):
        pr = {r.id: r for r in pagerank(_pairs_df(spark, edges)).collect()}
        assert {v.degree for v in pr.values()} == {1}
        assert pr[1].rank == pr[2].rank == 0.5
        cc = {
            r.doc_id: r.cluster_id
            for r in connected_components(_pairs_df(spark, edges)).collect()
        }
        release_staging()
        assert cc == {1: 1, 2: 1}


def test_dyads_rank_uniform_and_clusters_disjoint(spark):
    pr = {r.id: r.rank for r in pagerank(_pairs_df(spark, DYADS)).collect()}
    assert set(pr.values()) == {round(1 / 6, 6)}
    cc = {
        r.doc_id: r.cluster_id
        for r in connected_components_alternating(_pairs_df(spark, DYADS)).collect()
    }
    release_staging()
    assert cc == {1: 1, 2: 1, 3: 3, 4: 3, 5: 5, 6: 5}


def test_star_of_stars_single_cluster_hub_ranks_top(spark):
    cc = {
        r.doc_id: r.cluster_id
        for r in connected_components_alternating(
            _pairs_df(spark, STAR_OF_STARS)
        ).collect()
    }
    assert set(cc.values()) == {1} and len(cc) == 10
    pr = {r.id: r for r in pagerank(_pairs_df(spark, STAR_OF_STARS)).collect()}
    release_staging()
    leaves = {pr[i].rank for i in range(5, 11)}
    subhubs = {pr[i].rank for i in (2, 3, 4)}
    assert len(leaves) == 1 and len(subhubs) == 1, "level symmetry"
    # the SUB-HUBS out-rank the hub: each collects TWO degree-1 leaves'
    # entire rank, while the hub gets only a third of each sub-hub's
    # (0.188 > 0.125 > 0.068) — centrality here is leaf-weighted, not
    # hop-count; a hub-first assumption is exactly the kind of wrong
    # intuition this fixture exists to pin
    assert max(subhubs) > pr[1].rank > max(leaves)


# ---------------------------------------------------------------------
# documents-induced chain: the banded near-dup graph IS a path
# ---------------------------------------------------------------------

_CHAIN_LEN = 6
_TOKENS = [f"tok{i:02d}" for i in range(2 * _CHAIN_LEN + 10)]


def _chain_rows():
    """Doc i = 12 tokens starting at offset 2i: consecutive docs share
    8 of their 10 shingles (J = 8/12 = 0.667 >= 0.5 → edge), docs two
    apart share 6/14 (0.429 < 0.5 → no edge) — the verified pair graph
    is exactly the path 1-2-...-6 (band collisions checked by the pair
    assertion below, not assumed)."""
    rows = []
    for i in range(_CHAIN_LEN):
        rows.append((i + 1, " ".join(_TOKENS[2 * i : 2 * i + 12])))
    # an isolated unique doc and degenerate rows ride along
    rows.append((50, "entirely disjoint vocabulary lives in this doc only"))
    rows.append((51, ""))
    rows.append((52, None))
    return rows


CHAIN_ENTRIES = ["doc_near_dup_banded", "doc_pagerank", "doc_dup_clusters_panel", "corpus_keep_central"]


@pytest.fixture(scope="module")
def chain_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("chain_sf")
    src = "/root/testdata/sf0.001"
    rows = _chain_rows()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ", ".join("(?, ?, 'en', 'chain', NULL)" for _ in rows)
        + ") AS t(doc_id, text, lang, source, n_chars)",
        [x for r in rows for x in r],
    )
    con.execute(
        "COPY (SELECT doc_id, text, lang, source, "
        "CAST(coalesce(length(text), 0) AS BIGINT) AS n_chars FROM d) "
        f"TO '{out}/documents.parquet' (FORMAT PARQUET)"
    )
    for t in TABLES:
        p = os.path.join(src, f"{t}.parquet")
        if t != "documents" and os.path.exists(p):
            shutil.copy(p, os.path.join(out, f"{t}.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def chain_duck(chain_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(chain_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


def test_chain_pairs_are_exactly_the_path(spark, chain_dir):
    """The fixture's reason to exist: the banded pair graph must be
    the 6-node path (every consecutive edge band-collides AND
    verifies; no skip edge sneaks in) — otherwise the topology tests
    below silently test a different shape."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.llm.dedup import near_dup_pairs_banded
    from yelp_review_data_analysis_using_big_data_technologies_spark.sources.readers import load_table

    docs = load_table(spark, chain_dir, "documents")
    got = sorted(
        (r.id_a, r.id_b) for r in near_dup_pairs_banded(docs).collect()
    )
    release_staging()
    assert got == [(i, i + 1) for i in range(1, _CHAIN_LEN)]


@pytest.mark.parametrize("name", CHAIN_ENTRIES)
def test_entry_twins_agree_on_chain_corpus(spark, chain_dir, chain_duck, name, check):
    try:
        problems = check.compare(
            name,
            spark,
            chain_duck,
            chain_dir,
            entrymod.queries()[name],
            entrymod.oracle_sql()[name],
        )
    finally:
        release_staging()
    assert not problems, "\n".join(problems)


def test_keep_central_on_chain_keeps_a_middle_doc(spark, chain_dir):
    """On a path the most-central member is an interior node — a
    keep-central that returned an endpoint would be echoing input
    order, not centrality."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.plans.llm_queries import corpus_keep_central

    out = corpus_keep_central(spark, chain_dir).collect()
    release_staging()
    chain_cluster = [r for r in out if r.cluster_id == 1]
    assert len(chain_cluster) == 1
    assert chain_cluster[0].n_members == _CHAIN_LEN
    assert 1 < chain_cluster[0].keep_doc_id < _CHAIN_LEN

"""MMR re-rank suite (llm/vectors.py::mmr_rerank): the greedy
diversity selection pinned on a hand-computable geometry where pure
relevance and MMR disagree, plus the bounded-pool and validation
contracts.
"""

import math

import pytest

from yelp_review_data_analysis_using_big_data_technologies_spark.llm.vectors import mmr_rerank


def _emb(spark, rows):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _queries(spark, rows):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "query_id long, query_vec array<float>",
    )


def test_mmr_prefers_diverse_over_redundant(spark):
    # q = e_x. d1 = e_x (rel 1.0); d2 nearly parallel to d1 (rel ~.995,
    # sim(d1,d2) ~.995); d3 at 45° (rel ~.707, sim(d1,d3) ~.707).
    # Relevance alone ranks d1,d2,d3; with λ=0.5 the second pick is
    # 0.5·.995 − 0.5·.995 ≈ 0 for d2 vs 0.5·.707 − 0.5·.707·... — d3's
    # penalty is its sim to d1 (~.707): 0.5·.707−0.5·.707=0 too — use
    # λ=0.4 so the redundant doc loses: d2: .4·.995−.6·.995 = −.199;
    # d3: .4·.707−.6·.707 = −.1414 → d3 wins the second slot.
    emb = _emb(
        spark,
        [
            (1, [1.0, 0.0]),
            (2, [0.995, 0.0999]),
            (3, [0.7071, 0.7071]),
        ],
    )
    q = _queries(spark, [(0, [1.0, 0.0])])
    out = mmr_rerank(emb, q, k=3, pool=3, lam=0.4).collect()
    order = [r.vec_id for r in out]
    assert order[0] == 1  # highest relevance always first
    assert order[1] == 3  # diversity beats redundancy
    assert order[2] == 2
    r2 = out[1]
    # d1 == q, so sim(d3, d1) == rel(d3):
    # mmr = 0.4·rel − 0.6·rel = −0.2·rel
    assert math.isclose(r2.mmr, -0.2 * r2.rel, abs_tol=2e-6)


def test_mmr_lambda_one_is_pure_relevance(spark):
    emb = _emb(
        spark,
        [(1, [1.0, 0.0]), (2, [0.995, 0.0999]), (3, [0.7071, 0.7071])],
    )
    q = _queries(spark, [(0, [1.0, 0.0])])
    out = mmr_rerank(emb, q, k=3, pool=3, lam=1.0).collect()
    assert [r.vec_id for r in out] == [1, 2, 3]  # relevance order kept


def test_mmr_multiple_queries_independent(spark):
    emb = _emb(
        spark,
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.9, 0.1]), (4, [0.1, 0.9])],
    )
    q = _queries(spark, [(10, [1.0, 0.0]), (20, [0.0, 1.0])])
    out = mmr_rerank(emb, q, k=2, pool=4, lam=0.9)
    rows = {(r.query_id, r.rk): r.vec_id for r in out.collect()}
    assert rows[(10, 1)] == 1 and rows[(20, 1)] == 2  # per-query argmax


def test_mmr_pool_larger_than_corpus_truncates(spark):
    emb = _emb(spark, [(1, [1.0, 0.0]), (2, [0.5, 0.5])])
    q = _queries(spark, [(0, [1.0, 0.0])])
    out = mmr_rerank(emb, q, k=4, pool=4, lam=0.5).collect()
    assert len(out) == 2  # only two candidates exist; no phantom rows
    assert [r.rk for r in out] == [1, 2]


def test_mmr_validation(spark):
    emb = _emb(spark, [(1, [1.0, 0.0])])
    q = _queries(spark, [(0, [1.0, 0.0])])
    with pytest.raises(ValueError):
        mmr_rerank(emb, q, k=0)
    with pytest.raises(ValueError):
        mmr_rerank(emb, q, k=5, pool=3)
    with pytest.raises(ValueError):
        mmr_rerank(emb, q, lam=1.5)

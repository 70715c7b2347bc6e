"""The salted local-top-k prune in llm/vectors.py::_rank_top_k must
be EXACT — identical output with the prune on and off — including on
tie-heavy scores where a wrong tie order would let a salt bucket keep
the wrong row.
"""

from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.llm.vectors import _rank_top_k


def _scored(spark, n=500, queries=3):
    # heavy score ties: only 7 distinct scores across 500 candidates,
    # so the (score DESC, id ASC) tie-break does all the work
    return (
        spark.range(n)
        .select(
            (F.col("id") % queries).alias("query_id"),
            F.col("id").alias("vec_id"),
            ((F.col("id") % 7) / 10.0).alias("__cos"),
        )
    )


def test_prune_is_exact_under_ties(spark):
    scored = _scored(spark)
    pruned = _rank_top_k(scored, 10, "query_id", "vec_id").collect()
    plain = _rank_top_k(
        scored, 10, "query_id", "vec_id", prune_salt=0
    ).collect()
    assert pruned == plain
    assert len(pruned) == 30  # 10 per query


def test_prune_handles_k_exceeding_candidates(spark):
    scored = _scored(spark, n=9, queries=3)  # 3 candidates per query
    rows = _rank_top_k(scored, 10, "query_id", "vec_id").collect()
    assert len(rows) == 9
    assert sorted({r.rk for r in rows}) == [1, 2, 3]

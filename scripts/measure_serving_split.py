"""One-off measurement: stage-split of ``retrieval_serving_pipeline``
(closes the r12→r14 verdict watch item on the entry's cost history).

The entry's headline cost stepped from ~3.5 s (r11) to ~5.5-6 s (r12
onward).  The r12 round ADDED the RM3 pseudo-relevance-feedback leg to
the composition (``bm25_prf_topk`` — a second full BM25 pass plus the
expansion aggregate), so the hypothesis to adjudicate is "the step is
the PRF leg's price, not a regression in the pre-existing legs".

Method: on ONE machine state, median-of-``runs`` timings of
  (a) the full serving pipeline (as benched),
  (b) the same composition with the PRF leg removed (r11 shape),
  (c) the PRF leg alone (its two BM25 passes + expansion agg).
If (a) − (b) ≈ (c)'s marginal cost and (b) ≈ the r11-era cost scaled
by the machine-drift factor, the step is attributed functionality,
not noise and not a regression.

Usage::

    python scripts/measure_serving_split.py [sf_dir] [runs]

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.llm import terms as ltm
from yelp_review_data_analysis_using_big_data_technologies_spark.llm import vectors as lvec
from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import release_staging
from yelp_review_data_analysis_using_big_data_technologies_spark.plans import llm_queries as lq
from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark
from yelp_review_data_analysis_using_big_data_technologies_spark.sources.readers import load_table


def _serving_no_prf(spark, sf_dir):
    """The r11 shape: identical composition minus the PRF leg."""
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    emb = lq._load_embeddings(spark, sf_dir)
    path = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_ivf_serve_noprf",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    lvec.build_ivf_index(emb, path, n_cells=lq._IVF_CELLS)
    q = emb.filter(F.col("vec_id") == lq._HYBRID_QVEC_ID).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    vec = lvec.search_ivf_index(
        spark, path, q, k=lq._HYBRID_LIST_K, n_probe=lq._IVF_PROBE
    ).select(F.col("vec_id").alias("doc_id"), "rk")
    lex = ltm.bm25_topk(docs, lq._BM25_QUERY, k=lq._HYBRID_LIST_K).select(
        "doc_id", "rk"
    )
    fused = ltm.rrf_fuse([lex, vec], rrf_k=lq._RRF_K)
    valid = emb.filter(
        lvec.finite_vec("embedding", lvec.EMBEDDING_DIM)
    ).select(F.col("vec_id").alias("doc_id"))
    pool = (
        fused.join(valid, on="doc_id", how="left_semi")
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(lq._SERVE_POOL)
    )
    cand = pool.select(
        F.lit(lq._HYBRID_QVEC_ID).cast("bigint").alias("query_id"),
        F.col("doc_id").alias("vec_id"),
        F.col("rrf_score").alias("rel"),
    )
    return lvec.mmr_rerank_candidates(
        cand, emb, k=lq._SERVE_K, lam=lq._MMR_LAMBDA
    ).orderBy("rk")


def _prf_alone(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return ltm.bm25_prf_topk(
        docs,
        lq._BM25_QUERY,
        k=lq._HYBRID_LIST_K,
        feedback_k=lq._PRF_FEEDBACK_K,
        expand_m=lq._PRF_EXPAND_M,
    )


def _median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("measure_serving_split")
    load_table(spark, sf_dir, "nation").count()  # warmup

    legs = {
        "full_pipeline": lambda: lq.retrieval_serving_pipeline(spark, sf_dir),
        "no_prf_pipeline": lambda: _serving_no_prf(spark, sf_dir),
        "prf_leg_alone": lambda: _prf_alone(spark, sf_dir),
    }
    out: dict[str, float] = {}
    for name, fn in legs.items():
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
            release_staging(blocking=True)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            spark.range(1).count()
        out[name] = _median(ts)
        out[f"{name}_samples"] = ts
    out["prf_marginal_in_pipeline"] = round(
        out["full_pipeline"] - out["no_prf_pipeline"], 3
    )
    print(json.dumps({"sf_dir": sf_dir, "runs": runs, **out}))


if __name__ == "__main__":
    main()

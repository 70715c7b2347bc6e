"""One-off measurement (r10): the VIRAL-SHINGLE regime — one shingle
in ~90% of all documents — pushed through the shingle-keyed operators
(dup_spans, winnow_pairs, the n-gram Jaccard family).

This is a different stress than the r8 LSH degenerate clique: there
the DOCUMENTS were near-identical (every band bucket saturated); here
the docs are pairwise DISSIMILAR except for one ultra-common phrase,
so correctness wants zero/few pairs while the posting joins see one
posting list covering the whole corpus.

What the operators do by design (verified here by measurement):

* ``dup_spans`` / ``remove_dup_spans``: occurrence counting is a
  partial-agg groupBy on the shingle hash + an equi-join back — LINEAR
  in postings; the viral hash is one skewed reduce key (AQE skew
  handling), never a pair join.  Expect ~2x wall at 2x docs.
* ``winnow_pairs``: the fingerprint df-cap (64) drops the viral
  fingerprint before the pair join — bounded by construction.
* ``ngram_jaccard_pairs``: the ``max_df`` cap (1000) is a CLIFF, not a
  dial: a viral shingle at df = 0.9·N is RETAINED while N ≤ ~1111
  (df² candidate pairs from that one shingle — quadratic pain) and
  silently DROPPED above (candidates collapse).  Both sides are
  semantically documented behavior; the perf hazard is the sub-cap
  side.
* ``ngram_jaccard_pairs_auto``: the mitigation — the one-pass profile
  sees the viral df² mass and dispatches to the PPJoin prefix plan,
  where the viral shingle (the globally COMMONEST) enters almost no
  document's rarest-first prefix.

Usage::

    python scripts/measure_viral_shingle.py [n_docs] [viral_frac]

Prints one JSON line per scale (n_docs and 2*n_docs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.llm.dedup import (
    _jaccard_postings,
    ngram_jaccard_candidate_profile,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_auto,
)
from yelp_review_data_analysis_using_big_data_technologies_spark.llm.spans import dup_spans
from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import release_staging
from yelp_review_data_analysis_using_big_data_technologies_spark.llm.winnow import winnow_fingerprints, winnow_pairs
from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark


def _corpus(spark, n_docs: int, viral_frac: float):
    """Doc i: 12 unique tokens, with the viral 3-token phrase spliced
    into the front of ``viral_frac`` of docs.  Every 13th doc is
    cloned with a tail edit so the pair operators have real work."""
    uniq = F.transform(
        F.sequence(F.lit(0), F.lit(11)),
        lambda j: F.concat(F.lit("u"), F.col("id"), F.lit("_"), j),
    )
    body = F.array_join(uniq, " ")
    viral = F.pmod(F.xxhash64("id"), F.lit(100)) < int(viral_frac * 100)
    base = spark.range(n_docs).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.when(viral, F.concat(F.lit("viral phrase tokens "), body))
        .otherwise(body)
        .alias("text"),
    )
    clones = base.where(F.pmod(F.xxhash64("doc_id"), F.lit(13)) == 0).select(
        F.concat(F.lit("c_"), F.col("doc_id")).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tailedit")).alias("text"),
    )
    return base.unionByName(clones)


def _wall(fn) -> tuple[float, int]:
    t0 = time.time()
    n = fn().count()
    release_staging()
    return round(time.time() - t0, 2), n


def measure(spark, n_docs: int, viral_frac: float) -> dict:
    docs = _corpus(spark, n_docs, viral_frac)

    sh = _jaccard_postings(docs, "doc_id", "text", 3)
    prof = ngram_jaccard_candidate_profile(sh, 0.5, max_df=1000)
    release_staging()

    spans_wall, spans_rows = _wall(lambda: dup_spans(docs, k=3, min_count=2))
    winnow_wall, winnow_rows = _wall(
        lambda: winnow_pairs(winnow_fingerprints(docs))
    )
    base_wall, base_rows = _wall(
        lambda: ngram_jaccard_pairs(docs, threshold=0.5)
    )
    auto_wall, auto_rows = _wall(
        lambda: ngram_jaccard_pairs_auto(docs, threshold=0.5)
    )
    assert auto_rows == base_rows, "auto diverged from base"
    return {
        "metric": "viral_shingle",
        "n_docs": n_docs,
        "viral_frac": viral_frac,
        "viral_df_vs_cap": (
            "under" if viral_frac * n_docs <= 1000 else "over"
        ),
        "candidates_full": prof["candidates_full"],
        "candidates_prefix": prof["candidates_prefix"],
        "auto_picks": (
            "prefix"
            if prof["candidates_full"] > 2 * max(prof["candidates_prefix"], 1)
            else "base"
        ),
        "dup_spans_wall_s": spans_wall,
        "dup_spans_rows": spans_rows,
        "winnow_pairs_wall_s": winnow_wall,
        "winnow_pairs_rows": winnow_rows,
        "jaccard_base_wall_s": base_wall,
        "jaccard_auto_wall_s": auto_wall,
        "result_pairs": base_rows,
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    viral_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    spark = get_spark(
        "measure_viral_shingle",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in (n_docs, 2 * n_docs):
        print(json.dumps(measure(spark, n, viral_frac)))


if __name__ == "__main__":
    main()

"""One-off measurement: what PPJoin prefix filtering buys on the
exact n-gram Jaccard self-join (backs
``llm/dedup.py::ngram_jaccard_pairs_prefix``).

The plain inverted-index join pays Σ df² candidate pairs over every
retained shingle; the prefix variant only indexes each document's
``|x| - ceil(t·|x|) + 1`` RAREST shingles, so common-but-under-max_df
shingles — the Σ df² bulk — never enter the self-join.  This script
builds a corpus in that regime (Zipf-ish token draws from a small
vocabulary → many mid-frequency shared shingles, plus planted
near-dup clones that must still be found), then measures:

1. candidate pairs + wall of the full posting self-join,
2. candidate pairs + wall of the prefix join,
3. result equality between both operators (the transparency contract
   that the driver twin also hashes at sf0.01).

Usage::

    python scripts/measure_prefix_jaccard.py [n_docs] [vocab] [doc_len] [t]

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.llm.dedup import (
    _jaccard_postings,
    ngram_jaccard_candidate_profile,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_auto,
    ngram_jaccard_pairs_prefix,
)
from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import release_staging, spread, stage
from yelp_review_data_analysis_using_big_data_technologies_spark.llm.text import shingled
from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark


def _corpus(spark, n_docs: int, vocab: int, doc_len: int):
    """Deterministic Zipf-ish corpus: token j of doc i is vocab word
    ``xxhash64(i, j) % (1 + (xxhash64(j, i) % vocab))`` — low word ids
    appear far more often than high ones, giving the mid-frequency
    shingle mass the prefix filter exists to skip.  Every 11th doc is
    cloned with a one-token tail edit (planted near-dups)."""
    base = (
        spark.range(n_docs)
        .select(
            F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(doc_len - 1)),
                    lambda j: F.concat(
                        F.lit("w"),
                        F.pmod(
                            F.xxhash64(F.col("id"), j),
                            F.lit(1).cast("bigint")
                            + F.pmod(F.xxhash64(j, F.col("id")), F.lit(vocab)),
                        ),
                    ),
                ),
                " ",
            ).alias("text"),
        )
    )
    clones = (
        base.where(F.pmod(F.xxhash64("doc_id"), F.lit(11)) == 0)
        .select(
            F.concat(F.lit("c_"), F.col("doc_id")).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tailedit")).alias("text"),
        )
    )
    return base.unionByName(clones)


def _postings(df):
    return stage(
        shingled(spread(df.select("doc_id", "text")), ["doc_id"], "text", 3, out="__sh0")
        .select(
            F.col("doc_id").alias("__id"),
            F.explode(F.array_distinct("__sh0")).alias("__s"),
        )
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    doc_len = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    t = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5

    spark = get_spark(
        "measure_prefix_jaccard",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = _corpus(spark, n_docs, vocab, doc_len)

    # --- candidate volumes (same max_df both sides) ----------------
    sh = _postings(docs)
    full_cands = (
        sh.alias("a")
        .join(sh.alias("b"), on="__s")
        .filter(F.col("a.__id") < F.col("b.__id"))
        .count()
    )
    dfreq = sh.groupBy("__s").agg(F.count(F.lit(1)).alias("__df")).filter(
        F.col("__df") <= 1000
    )
    ranked = sh.join(dfreq, on="__s").select(
        "__id",
        "__s",
        F.count(F.lit(1)).over(Window.partitionBy("__id")).alias("__sz"),
        F.row_number()
        .over(Window.partitionBy("__id").orderBy("__df", "__s"))
        .alias("__rn"),
    )
    prefix = ranked.filter(
        F.col("__rn") <= F.col("__sz") - F.ceil(F.lit(t) * F.col("__sz")) + 1
    )
    prefix_cands = (
        prefix.alias("a")
        .join(prefix.alias("b"), on="__s")
        .filter(F.col("a.__id") < F.col("b.__id"))
        .count()
    )
    release_staging()

    # --- end-to-end walls + result equality ------------------------
    t0 = time.time()
    base_pairs = ngram_jaccard_pairs(docs, threshold=t).collect()
    release_staging()
    wall_full = time.time() - t0

    t0 = time.time()
    pref_pairs = ngram_jaccard_pairs_prefix(docs, threshold=t).collect()
    release_staging()
    wall_prefix = time.time() - t0

    # the one-pass predictor + the regime dispatcher end to end
    t0 = time.time()
    prof = ngram_jaccard_candidate_profile(
        _jaccard_postings(docs, "doc_id", "text", 3), t
    )
    release_staging()
    wall_profile = time.time() - t0
    t0 = time.time()
    auto_pairs = ngram_jaccard_pairs_auto(docs, threshold=t).collect()
    release_staging()
    wall_auto = time.time() - t0

    want = sorted((r.id_a, r.id_b, r.jaccard) for r in base_pairs)
    got = sorted((r.id_a, r.id_b, r.jaccard) for r in pref_pairs)
    assert got == want, "prefix variant diverged from the base operator"
    got_auto = sorted((r.id_a, r.id_b, r.jaccard) for r in auto_pairs)
    assert got_auto == want, "auto variant diverged from the base operator"

    print(
        json.dumps(
            {
                "metric": "prefix_jaccard",
                "n_docs": n_docs,
                "vocab": vocab,
                "doc_len": doc_len,
                "threshold": t,
                "result_pairs": len(want),
                "candidates_full": full_cands,
                "candidates_prefix": prefix_cands,
                "candidate_reduction": round(1 - prefix_cands / max(full_cands, 1), 4),
                "wall_full_s": round(wall_full, 2),
                "wall_prefix_s": round(wall_prefix, 2),
                "predicted_full": prof["candidates_full"],
                "predicted_prefix": prof["candidates_prefix"],
                "wall_profile_s": round(wall_profile, 2),
                "wall_auto_s": round(wall_auto, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

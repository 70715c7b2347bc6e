"""Per-round cost + partition-shape probe for the checkpointed loops
(r16, the r15 verdict's #3/#7): BPE merge rounds and PageRank
iterations at the CURRENT core count (`SPARK_GRAFT_CPUS`).

The r15 scaling block showed 8 cores BEATING 32 on these entries
(vocab_bpe_merges 0.32, corpus_keep_central 0.62,
doc_pagerank_weighted 0.66) — the hypothesis is per-round tiny-task
scheduling overhead.  This probe reports, per round, the wall time
and the PARTITION COUNT of the checkpointed relation (what the next
round's jobs fan out over), so the fix (size-derived repartition vs
nothing) is chosen from data, not guesswork.

Usage: SPARK_GRAFT_CPUS=32 python scripts/measure_round_overhead.py [bpe|pagerank] [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import (
    release_all_staging,
    stage,
)
from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark
from yelp_review_data_analysis_using_big_data_technologies_spark.sources.readers import load_table


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "bpe"
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    spark = get_spark("measure-round-overhead")
    docs = load_table(spark, sf_dir, "documents")
    docs.count()  # warmup
    out: dict = {"mode": mode, "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"), "rounds": []}

    if mode == "bpe":
        from yelp_review_data_analysis_using_big_data_technologies_spark.llm.bpe import _round
        from yelp_review_data_analysis_using_big_data_technologies_spark.llm.text import tokens

        seq = stage(
            docs.filter(F.col("text").isNotNull()).select(
                F.col("doc_id"),
                F.posexplode(tokens("text")).alias("pos", "sym"),
            )
        )
        t0 = time.perf_counter()
        n0 = seq.count()
        out["seed_fill_sec"] = round(time.perf_counter() - t0, 3)
        out["stream_rows"] = n0
        stats_frames = []
        for i in range(1, 7):
            t0 = time.perf_counter()
            stats, seq = _round(seq, i)
            wall = round(time.perf_counter() - t0, 3)
            out["rounds"].append(
                {
                    "step": i,
                    "wall_sec": wall,
                    "ckpt_partitions": seq.rdd.getNumPartitions(),
                }
            )
            stats_frames.append(stats)
        t0 = time.perf_counter()
        u = stats_frames[0]
        for s in stats_frames[1:]:
            u = u.unionByName(s)
        u.write.format("noop").mode("overwrite").save()
        out["stats_union_sec"] = round(time.perf_counter() - t0, 3)
    else:
        from yelp_review_data_analysis_using_big_data_technologies_spark.llm import dedup as ldd
        from yelp_review_data_analysis_using_big_data_technologies_spark.operators.graph import pagerank

        pairs = stage(
            ldd.near_dup_pairs_banded(docs).select("id_a", "id_b")
        )
        t0 = time.perf_counter()
        n_pairs = pairs.count()
        out["pairs_fill_sec"] = round(time.perf_counter() - t0, 3)
        out["n_pairs"] = n_pairs
        t0 = time.perf_counter()
        pr = pagerank(pairs)
        pr.write.format("noop").mode("overwrite").save()
        out["pagerank_total_sec"] = round(time.perf_counter() - t0, 3)

    release_all_staging()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

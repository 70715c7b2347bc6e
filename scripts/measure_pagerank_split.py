"""Attribute doc_pagerank's wall time: pair generation vs the rank loop.

Times, in one session (runs interleaved):
  a. near_dup_pairs_banded(docs) noop-forced alone (the base relation);
  b. pagerank(pairs) noop-forced end-to-end (current default);
  c. pagerank(pairs, checkpoint_every=None) end-to-end (the pre-r15
     monolithic-plan shape);
  d. pagerank over a PRE-COLLECTED tiny literal edge list of the same
     pairs (loop cost with a free base).

Usage: python scripts/measure_pagerank_split.py [--sf DIR] [--runs N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark
from yelp_review_data_analysis_using_big_data_technologies_spark.sources.readers import load_table
from yelp_review_data_analysis_using_big_data_technologies_spark.llm import dedup as ldd
from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import release_staging
from yelp_review_data_analysis_using_big_data_technologies_spark.operators.graph import pagerank


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    runs = 3
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    spark = get_spark("measure-pagerank-split")
    load_table(spark, sf_dir, "nation").count()
    docs = load_table(spark, sf_dir, "documents")

    # one-time: collect the pair list for leg (d) — small by contract
    rows = ldd.near_dup_pairs_banded(docs).select("id_a", "id_b").collect()
    release_staging(blocking=True)
    spark.catalog.clearCache()
    lit_pairs = spark.createDataFrame(rows, "id_a bigint, id_b bigint")
    lit_pairs = lit_pairs.localCheckpoint(eager=True)
    print(f"n_pairs={len(rows)}", flush=True)

    out: dict[str, list[float]] = {}

    def leg(name, build):
        spark.sparkContext.setJobDescription(f"pr-split:{name}")
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        out.setdefault(name, []).append(dt)
        release_staging(blocking=True)
        spark.catalog.clearCache()
        print(f"{name:24s} {dt:8.3f}s", flush=True)

    for _ in range(runs):
        leg("pairs_only", lambda: ldd.near_dup_pairs_banded(docs))
        leg("pr_default", lambda: pagerank(
            ldd.near_dup_pairs_banded(docs)))
        leg("pr_monolithic", lambda: pagerank(
            ldd.near_dup_pairs_banded(docs), checkpoint_every=None))
        leg("pr_loop_only", lambda: pagerank(lit_pairs))
        leg("pr_loop_only_mono", lambda: pagerank(
            lit_pairs, checkpoint_every=None))
    print(json.dumps({"legs": out, "sf": sf_dir}))


if __name__ == "__main__":
    main()

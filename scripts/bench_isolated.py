"""Isolated per-query benchmark: same timing discipline as bench.py
(noop sink, blocking staging release, cache clear, GC, settle barrier)
but for an explicit list of entries in a fresh session — used to
adjudicate bench-ordering / staging-cache interactions that only show
up in the 120-query headline run (r11 VERDICT watch item #1).

Usage: python scripts/bench_isolated.py q1 [q2 ...] [--runs N] [--sf DIR]
Prints one JSON line {"queries": {name: [samples...]}, "median": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark
from yelp_review_data_analysis_using_big_data_technologies_spark.sources.readers import load_table
from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import release_staging

import __spark_entry__ as entrymod


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("bench-isolated")
    load_table(spark, args.sf, "nation").count()
    queries = entrymod.queries()

    samples: dict[str, list[float]] = {}
    for name in args.names:
        fn = queries[name]
        samples[name] = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.perf_counter() - t0, 3))
            release_staging(blocking=True)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            spark.range(1).count()
    print(
        json.dumps(
            {
                "queries": samples,
                "median": {
                    n: round(statistics.median(v), 3) for n, v in samples.items()
                },
                "best": {n: min(v) for n, v in samples.items()},
                "runs": args.runs,
                "sf": args.sf,
            }
        )
    )


if __name__ == "__main__":
    main()

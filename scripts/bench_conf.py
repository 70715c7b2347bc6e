"""Per-entry A/B benchmark under EXPLICIT session configs.

Same timing discipline as scripts/bench_isolated.py (noop sink,
blocking staging release, cache clear, GC, settle barrier), but the
session is built with ``--conf k=v`` overrides so a candidate config
(join strategy, shuffle codec, ...) can be priced on a representative
entry subset before touching session.py (guide §1: measure first;
§1.2: config is the LAST lever).

Usage::

    python scripts/bench_conf.py q1 [q2 ...] [--runs N] [--sf DIR] \
        [--conf spark.sql.join.preferSortMergeJoin=false ...]

Prints one JSON line {"queries": {...}, "median": {...}, "conf": {...}}.
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
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--conf", action="append", default=[])
    args = ap.parse_args()

    conf = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark("bench-conf", extra_conf=conf)
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
                    n: round(statistics.median(v), 3)
                    for n, v in samples.items()
                },
                "runs": args.runs,
                "sf": args.sf,
                "conf": conf,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Measure: the association-rule fan-out cap on a hot entity (r10).

The claim on operators/association.py::cooccurrence_lift is that one
pathological entity (a bot touching k distinct items) contributes
k·(k−1)/2 pairs to the self-join — quadratic — and that
``max_items_per_key`` excises it up front, keeping the join bounded
by the benign entities' fan-out.  This script builds a workload of
benign entities (≤8 items each) plus ONE bot holding ``k_bot``
distinct items, runs the operator capped and uncapped, and prints
wall times and pair counts.

MEASURED (local[32], r10, 10M facts / 1.25M benign users over a
500-item domain, one bot with k=5,000 distinct items): capped 11.9 s
/ 2,750 pair rows vs uncapped 22.0 s / 12,500,250 pair rows — the
single bot is 99.98% of the uncapped output and the cap cuts wall
1.86x.  The blowup is k²/2: a 50k-item bot means 1.25G pairs from one
key (one straggler task at cluster scale), which is why the cap
excises rather than samples.

Run: python scripts/measure_cooccurrence_cap.py [n_facts] [k_bot]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.operators.association import cooccurrence_lift
from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark


def workload(spark, n: int, k_bot: int):
    benign = spark.range(n).select(
        # CONSECUTIVE ids per user so the per-user item mix is genuine
        # (a modulo-user layout gives every user a stride-500-aligned
        # id set and collapses to one item per user)
        F.expr("id div 8").alias("user_id"),
        F.concat(
            F.lit("item_"), ((F.col("id") * 2654435761) % 500).cast("string")
        ).alias("event_type"),
    )
    bot = spark.range(k_bot).select(
        F.lit(-1).cast("long").alias("user_id"),
        F.concat(F.lit("bot_item_"), F.col("id").cast("string")).alias(
            "event_type"
        ),
    )
    return benign.unionByName(bot)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    k_bot = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    spark = get_spark("measure-cooc")
    facts = workload(spark, n, k_bot)
    facts.count()  # warm

    results = {}
    for label, cap in (("capped_1000", 1000), ("uncapped", 10_000_000)):
        t0 = time.perf_counter()
        n_pairs = cooccurrence_lift(facts, max_items_per_key=cap).count()
        results[label] = (time.perf_counter() - t0, n_pairs)
        print(
            f"{label}: {results[label][0]:.1f}s, {n_pairs} pair rows"
        )
    cap_t, unc_t = results["capped_1000"][0], results["uncapped"][0]
    print(f"bot k={k_bot}: cap cuts wall {unc_t / cap_t:.2f}x")


if __name__ == "__main__":
    main()

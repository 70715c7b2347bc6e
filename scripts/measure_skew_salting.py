"""One-off measurement: what key-salting buys on a skewed shuffle join
(SURVEY §2 skew family; backs `operators/skew.py::salted_join`).

The sf0.1 fixtures are uniform, so the bench never exercises the
regime salting exists for: one hot key owning a large share of a big
join's rows, which serializes that key's entire probe onto one
reducer task.  This script builds that regime synthetically —
``hot_share`` of N left rows carry ONE key, the rest spread uniformly
— joins against an above-broadcast-threshold right side, and times
three configurations of the SAME logical join:

1. plain shuffle join, AQE skew handling OFF  (the straggler baseline)
2. ``salted_join`` (buckets=32), AQE skew OFF (the manual fix)
3. plain join, AQE skew-join ON with a low split threshold
   (what Spark's runtime re-plan does on its own)

All three must return identical row counts (inner join, every left
row matches exactly once).  The expected story — and the engine's
documented guidance — is: AQE's skew-join split is the first line of
defense for plain shuffle joins; manual salting matches it where AQE
cannot see or split the skew (aggregation pipelines, joins hidden
behind other exchanges, non-splittable single-key partitions).

Usage::

    python scripts/measure_skew_salting.py [N] [hot_share] [buckets]

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.operators.skew import salted_join
from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark

N_KEYS = 10_000  # cold-key cardinality
HOT_KEY = -1


def _build(spark, n: int, hot_share: float):
    """Left: n rows, ``hot_share`` of them on HOT_KEY (hash-chosen so
    the hot rows interleave with cold ones in every partition, as real
    skew does).  Right: one row per key with a hash payload.  The
    fixture does NOT size the right side past the 10 MB broadcast
    threshold — each measured config disables broadcast explicitly
    (spark.sql.autoBroadcastJoinThreshold=-1), keeping the fixture
    small while the join stays shuffle-based by construction."""
    left = spark.range(n).select(
        F.when(
            F.pmod(F.xxhash64("id"), F.lit(1000)) < int(hot_share * 1000),
            F.lit(HOT_KEY),
        )
        .otherwise(F.pmod(F.xxhash64("id", F.lit(7)), F.lit(N_KEYS)))
        .cast("long")
        .alias("k"),
        (F.col("id") % 997).alias("v"),
    )
    right = spark.range(N_KEYS + 1).select(
        (F.col("id") - 1).cast("long").alias("k"),  # includes HOT_KEY = -1
        F.sha2(F.col("id").cast("string"), 256).alias("dim_payload"),
    )
    return left, right


def _time_join(spark, fn) -> tuple[float, int]:
    t0 = time.perf_counter()
    out = fn()
    # count() forces the full join; a noop write would too, but the
    # count doubles as the cross-config equality check
    n = out.count()
    return round(time.perf_counter() - t0, 3), n


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    hot_share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark("skew_measure")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    left, right = _build(spark, n, hot_share)
    left.count()  # materialize-warmup of the generators
    right.count()

    results = {}

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results["plain_skewed_aqe_off"] = _time_join(
        spark, lambda: left.join(right, on="k")
    )
    results["salted_aqe_off"] = _time_join(
        spark, lambda: salted_join(left, right, on="k", buckets=buckets)
    )

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # local partitions are far below the 256 MB default split
    # threshold — lower it so AQE actually sees this skew, as it would
    # at production partition sizes
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    results["plain_skewed_aqe_on"] = _time_join(
        spark, lambda: left.join(right, on="k")
    )

    counts = {k: c for k, (_, c) in results.items()}
    assert len(set(counts.values())) == 1, f"row-count divergence: {counts}"
    print(
        json.dumps(
            {
                "metric": "skew_join_seconds",
                "n_left": n,
                "hot_share": hot_share,
                "buckets": buckets,
                "rows_out": next(iter(counts.values())),
                "seconds": {k: t for k, (t, _) in results.items()},
            }
        )
    )


if __name__ == "__main__":
    main()

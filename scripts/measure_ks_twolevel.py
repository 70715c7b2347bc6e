"""Measure: the KS statistic's two-level prefix-sum CDF vs the naive
single-window formulation (r10).

The claim on operators/drift.py::ks_2sample is that a global
``sum() OVER (ORDER BY v)`` funnels every distinct value through ONE
task, while the two-level decomposition windows in parallel inside
quantile buckets and only serializes the ≤buckets-row subtotal
relation.  This script generates two overlapping samples with a
configurable distinct domain, runs the operator and a naive-window
twin of it to a 1-row collect, and prints wall times plus the
(identical) statistics.

MEASURED (local[32], 128 GiB JVM, r10): the decomposition does NOT
win locally — 34.4 s vs 9.9 s naive at 20M rows / 2M distinct, and
155 s vs 43 s at 40M rows / 40M distinct (a steady ~3.5x constant
factor from the staging persist + five extra shuffles).  A
single-task sort of even 40M distinct values fits one local executor
comfortably, so the naive window's serialization never bites here.
The two-level shape is kept anyway for the same reason the salted
_rank_top_k prune is (+0.8 s locally): its property is the BOUNDED
max-task — at cluster scale a continuous measure makes the distinct
relation ~N-sized, and one executor sorting tens of GB spills and
straggles where the bucketed windows spread evenly.  An earlier
version was 40x slower for a fixable reason this script caught: 31
separate exact F.percentile edge aggregates each buffered the whole
distinct relation; edges only balance buckets, so approx_percentile
(one sketch pass) replaced them.

Run: python scripts/measure_ks_twolevel.py [n_rows] [n_distinct]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.operators.drift import ks_2sample
from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark


def sides(spark, n: int, distinct: int):
    a = spark.range(n).select(
        (((F.col("id") * 2654435761) % distinct)).cast("double").alias("value")
    )
    b = spark.range(n).select(
        (((F.col("id") * 40503) % distinct) + distinct * 0.1)
        .cast("double")
        .alias("value")
    )
    return a, b


def naive(a, b):
    counts = (
        a.select(F.col("value").alias("v"), F.lit(1).alias("ca"), F.lit(0).alias("cb"))
        .unionByName(
            b.select(
                F.col("value").alias("v"), F.lit(0).alias("ca"), F.lit(1).alias("cb")
            )
        )
        .groupBy("v")
        .agg(F.sum("ca").alias("an"), F.sum("cb").alias("bn"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    totals = counts.agg(
        F.sum("an").alias("na"), F.sum("bn").alias("nb")
    )
    return (
        counts.withColumn("cum_a", F.sum("an").over(w))
        .withColumn("cum_b", F.sum("bn").over(w))
        .crossJoin(F.broadcast(totals))
        .select(
            F.abs(
                F.col("cum_a") / F.col("na") - F.col("cum_b") / F.col("nb")
            ).alias("d")
        )
        .agg(F.round(F.max("d"), 6).alias("ks_stat"))
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    distinct = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    spark = get_spark("measure-ks")
    a, b = sides(spark, n, distinct)
    a.count(), b.count()  # warm

    t0 = time.perf_counter()
    row = ks_2sample(a, b).collect()[0]
    two_level = time.perf_counter() - t0

    t0 = time.perf_counter()
    nv = naive(a, b).collect()[0]
    naive_s = time.perf_counter() - t0

    print(
        f"n={n} distinct~{distinct}: two-level {two_level:.1f}s "
        f"(D={row.ks_stat}) vs naive global window {naive_s:.1f}s "
        f"(D={nv.ks_stat}) -> {naive_s / two_level:.2f}x"
    )
    assert row.ks_stat == nv.ks_stat, "formulations disagree"


if __name__ == "__main__":
    main()

"""Measure: two-level distributed_rank vs the naive per-key window
sort on a skewed key (r9).

The claim on operators/ranking.py is that
``rank() OVER (PARTITION BY key ORDER BY v)`` serializes each key
into one task (WindowExec sorts the key's full row set there), while
the two-level decomposition only windows over the DISTINCT-VALUE
relation — so on a realistic skewed workload (one hot key holding
most rows, values heavily duplicated) the decomposition should win
and the gap should WIDEN with scale.  This script generates such a
workload in-memory (hot key share ~90%, values drawn from a small
distinct domain as in real tick/price data), runs both formulations
to a noop sink, and prints wall times.

Run: python scripts/measure_distributed_rank.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.operators.ranking import distributed_rank
from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark


def workload(spark, n: int):
    """~90% of rows in one hot key; values from a 10k-distinct domain."""
    return (
        spark.range(n)
        .select(
            F.col("id"),
            F.when(F.col("id") % 10 < 9, F.lit("hot"))
            .otherwise(F.concat(F.lit("cold_"), (F.col("id") % 37).cast("string")))
            .alias("k"),
            ((F.col("id") * 2654435761) % 10_000).cast("double").alias("v"),
        )
    )


def naive(df):
    w = Window.partitionBy("k").orderBy(F.col("v").desc_nulls_last())
    n = F.count("*").over(Window.partitionBy("k"))
    return df.select(
        "id",
        "k",
        "v",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("dense_rnk"),
        F.round(
            F.when(n > 1, F.percent_rank().over(w)).otherwise(F.lit(0.0)), 6
        ).alias("pct_rank"),
    )


def timed(label, df):
    t = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t
    print(f"  {label}: {dt:.2f} s", flush=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("measure_drank")
    df = workload(spark, n)
    df.count()  # warm
    for _ in range(2):
        t_naive = timed(f"window rank   n={n}", naive(df))
        t_two = timed(f"two-level     n={n}", distributed_rank(df, ["k"], "v"))
    print(f"speedup (last pair): {t_naive / t_two:.2f}x")


if __name__ == "__main__":
    main()

"""One-off measurement: what the explicit Bloom runtime filter buys on
a fact↔selective-dimension shuffle join (backs ``operators/bloom.py``).

The regime the operator exists for: the dimension is SELECTIVE (only a
small fraction of fact rows survive the join) but broadcast-INELIGIBLE
(too big, or the session caps broadcasts), so the join shuffles both
sides.  The Bloom sketch culls non-matching fact rows before the fact
Exchange — shuffle bytes drop roughly to the join selectivity plus the
false-positive rate.

This script joins a synthetic fact (N rows, ``n_fact_keys`` distinct
keys) against a dimension holding ``dim_frac`` of the keyspace, with
``spark.sql.autoBroadcastJoinThreshold=-1`` (forcing the shuffle join
the operator targets) and AQE left ON, and times:

1. plain shuffle join                (baseline: 100% of fact shuffles)
2. ``bloom_pruned_join``             (sketch build + pruned shuffle)

Both must return identical row counts (transparency contract — also
pinned cross-engine by the ``join_bloom_pruned`` driver twin).  Wall
time at local[32]/small data undersells the win: the shuffle here is
in-memory on one machine, while at 100 TB the pruned rows are network
bytes; the honest headline is the SHUFFLE-ROW reduction, which the
script reports from the Spark metrics alongside wall time.

Usage::

    python scripts/measure_bloom_join.py [N] [n_fact_keys] [dim_frac]

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.operators.bloom import (
    bloom_pruned_join,
    suggest_bits,
)
from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_fact_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    dim_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.04

    spark = get_spark("measure_bloom_join")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    n_dim = int(n_fact_keys * dim_frac)
    fact = spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(n_fact_keys)).alias("f_k"),
        F.col("id").alias("payload"),
    )
    # dimension owns a hash-scattered dim_frac slice of the keyspace
    dim = (
        spark.range(n_fact_keys)
        .select(F.col("id").alias("d_k"))
        .where(F.pmod(F.xxhash64("id"), F.lit(1_000_000)) < int(1_000_000 * dim_frac))
    )

    # --- 1. plain shuffle join -------------------------------------
    t0 = time.time()
    plain_rows = fact.join(dim, fact["f_k"] == dim["d_k"], "inner").count()
    t_plain = time.time() - t0

    # --- 2. bloom-pruned join --------------------------------------
    num_bits, num_hashes = suggest_bits(max(n_dim, 1), fpp=0.01)
    t0 = time.time()
    bloom_rows = bloom_pruned_join(
        fact,
        dim,
        fact_key="f_k",
        dim_key="d_k",
        num_bits=num_bits,
        num_hashes=num_hashes,
    ).count()
    t_bloom = time.time() - t0

    assert bloom_rows == plain_rows, (bloom_rows, plain_rows)

    # shuffle-row reduction, measured directly: rows entering the fact
    # Exchange = all of fact (plain) vs rows surviving the bit test
    from yelp_review_data_analysis_using_big_data_technologies_spark.operators.bloom import (
        bloom_prune,
        build_bloom,
    )

    sketch = build_bloom(dim, "d_k", num_bits=num_bits, num_hashes=num_hashes)
    kept = bloom_prune(
        fact, "f_k", sketch, num_bits=num_bits, num_hashes=num_hashes
    ).count()

    print(
        json.dumps(
            {
                "metric": "bloom_join",
                "n_fact": n,
                "n_dim": n_dim,
                "dim_frac": dim_frac,
                "num_bits": num_bits,
                "num_hashes": num_hashes,
                "join_rows": plain_rows,
                "fact_rows_shuffled_plain": n,
                "fact_rows_shuffled_bloom": kept,
                "shuffle_reduction": round(1 - kept / n, 4),
                "wall_plain_s": round(t_plain, 2),
                "wall_bloom_s": round(t_bloom, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

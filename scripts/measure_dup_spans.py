"""One-off measurement: dup_spans under the boilerplate-heavy regime
(backs ``llm/spans.py`` scale claims).

The near-dup pair family goes quadratic when one clique saturates a
bucket (the r8 LSH measurement); span detection structurally CANNOT —
the viral-shingle join is postings × 1 (each position row matches
exactly one row of the dup-hash relation), and the islands merge is
bounded per document.  This script verifies that claim empirically: a
corpus where ``boiler_frac`` of documents share one boilerplate
header (the worst case for pair-based dedup) is run at 1× and 2×
scale — wall time must grow ~linearly (well under the 4× a quadratic
stage would show), and the boilerplate share must not bend the curve.

Usage::

    python scripts/measure_dup_spans.py [n_docs] [boiler_frac]

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.llm.spans import dup_spans
from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import release_staging
from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark

BOILER = "all rights reserved contact support for terms of service details"


def _corpus(spark, n_docs: int, boiler_frac: float):
    """~60-token docs; ``boiler_frac`` of them carry the same 10-token
    boilerplate header; bodies are hash-unique."""
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(49)),
            lambda j: F.concat(
                F.lit("w"), F.pmod(F.xxhash64(F.col("id"), j), F.lit(1_000_000))
            ),
        ),
        " ",
    )
    boiler = F.pmod(F.xxhash64("id"), F.lit(1000)) < int(1000 * boiler_frac)
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(boiler, F.concat(F.lit(BOILER + " "), body))
        .otherwise(body)
        .alias("text"),
    )


def _run(spark, n_docs: int, boiler_frac: float):
    docs = _corpus(spark, n_docs, boiler_frac)
    t0 = time.time()
    spans = dup_spans(docs, k=5)
    n_spans = spans.count()
    wall = time.time() - t0
    release_staging()
    return n_spans, round(wall, 2)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    boiler_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3

    spark = get_spark(
        "measure_dup_spans",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + codegen
    _run(spark, 2_000, boiler_frac)

    spans_1x, wall_1x = _run(spark, n_docs, boiler_frac)
    spans_2x, wall_2x = _run(spark, 2 * n_docs, boiler_frac)

    print(
        json.dumps(
            {
                "metric": "dup_spans_scaling",
                "n_docs": n_docs,
                "boiler_frac": boiler_frac,
                "spans_1x": spans_1x,
                "spans_2x": spans_2x,
                "wall_1x_s": wall_1x,
                "wall_2x_s": wall_2x,
                "scale_ratio": round(wall_2x / max(wall_1x, 1e-9), 2),
            }
        )
    )


if __name__ == "__main__":
    main()

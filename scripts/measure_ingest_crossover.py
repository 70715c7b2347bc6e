"""One-off measurement: recompute-vs-indexed dedup-ingest crossover
(SURVEY §9 / r5 VERDICT item 4).

The sf0.1 bench could not demonstrate the indexed mode's winning
regime (corpus >> delta needs O(1e6+) docs).  This script generates a
synthetic corpus of N small docs, bootstraps the dedup ingest in each
mode, then drops a small delta wave and times the DELTA batch alone —
the steady-state per-batch cost a long-lived stream pays.

Usage::

    python scripts/measure_ingest_crossover.py [N] [delta]

Prints one JSON line with bootstrap + delta timings per mode.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark
from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.ingest import (
    stream_dedup_ingest_to_parquet,
)

BASE = "/tmp/spark_graft_ingest_crossover"


def _gen_wave(spark, start: int, count: int, dup_every: int | None, out: str):
    """``count`` docs of 8 hashed tokens each; with ``dup_every``,
    every k-th doc copies the text of corpus doc ``id % start`` (an
    exact duplicate the ingest must reject against the corpus)."""
    ids = spark.range(start, start + count).select(F.col("id").alias("doc_id"))
    src_id = (
        F.when(
            (F.col("doc_id") % dup_every == 0) & F.lit(start > 0),
            F.col("doc_id") % F.lit(start),
        ).otherwise(F.col("doc_id"))
        if dup_every
        else F.col("doc_id")
    )
    text = F.concat_ws(
        " ",
        *[
            F.substring(
                F.md5(F.concat(F.lit(f"{k}:"), src_id.cast("string"))), 1, 8
            )
            for k in range(8)
        ],
    )
    ids.select("doc_id", text.alias("text")).coalesce(4).write.mode(
        "overwrite"
    ).parquet(out)


def _run(spark, src: str, mode: str) -> None:
    root = f"{BASE}/{mode}"
    kwargs = {"index_path": f"{root}/index"} if mode == "indexed" else {}
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    stream_dedup_ingest_to_parquet(
        stream, f"{root}/corpus", f"{root}/ckpt", **kwargs
    )


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    delta = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    spark = get_spark("ingest_crossover")
    shutil.rmtree(BASE, ignore_errors=True)

    results: dict[str, dict[str, float]] = {}
    for mode in ("recompute", "indexed"):
        src = f"{BASE}/{mode}/src"
        os.makedirs(src)
        _gen_wave(spark, 0, n, None, f"{BASE}/{mode}/w0")
        for f in os.listdir(f"{BASE}/{mode}/w0"):
            if f.endswith(".parquet"):
                shutil.move(f"{BASE}/{mode}/w0/{f}", f"{src}/a_{f}")
        t0 = time.monotonic()
        _run(spark, src, mode)
        boot = time.monotonic() - t0

        _gen_wave(spark, n, delta, 2, f"{BASE}/{mode}/w1")
        for f in os.listdir(f"{BASE}/{mode}/w1"):
            if f.endswith(".parquet"):
                shutil.move(f"{BASE}/{mode}/w1/{f}", f"{src}/b_{f}")
        t1 = time.monotonic()
        _run(spark, src, mode)
        dt = time.monotonic() - t1
        n_admitted = (
            spark.read.parquet(f"{BASE}/{mode}/corpus")
            .filter(F.col("ingest_batch") >= 1)
            .count()
        )
        results[mode] = {
            "bootstrap_s": round(boot, 2),
            "delta_batch_s": round(dt, 2),
            "delta_admitted": n_admitted,
        }
    same = (
        results["recompute"]["delta_admitted"]
        == results["indexed"]["delta_admitted"]
    )
    print(
        json.dumps(
            {
                "n_corpus": n,
                "n_delta": delta,
                "modes": results,
                "admitted_sets_equal_size": same,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

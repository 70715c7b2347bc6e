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

    # generate the (deterministic) waves ONCE; each mode gets copies
    _gen_wave(spark, 0, n, None, f"{BASE}/w0")
    _gen_wave(spark, n, delta, 2, f"{BASE}/w1")
    waves = {
        tag: [
            f"{BASE}/w{i}/{f}"
            for f in sorted(os.listdir(f"{BASE}/w{i}"))
            if f.endswith(".parquet")
        ]
        for tag, i in (("a", 0), ("b", 1))
    }

    results: dict[str, dict[str, float]] = {}
    for mode in ("recompute", "indexed"):
        src = f"{BASE}/{mode}/src"
        os.makedirs(src)
        for j, p in enumerate(waves["a"]):
            shutil.copy(p, f"{src}/a_{j}.parquet")
        t0 = time.monotonic()
        _run(spark, src, mode)
        boot = time.monotonic() - t0

        for j, p in enumerate(waves["b"]):
            shutil.copy(p, f"{src}/b_{j}.parquet")
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
    # TRUE set equality, not size equality: a mode admitting the wrong
    # 1000 docs must not read as equivalent
    rec = spark.read.parquet(f"{BASE}/recompute/corpus").select("doc_id")
    idx = spark.read.parquet(f"{BASE}/indexed/corpus").select("doc_id")
    sets_equal = (
        rec.exceptAll(idx).count() == 0 and idx.exceptAll(rec).count() == 0
    )
    print(
        json.dumps(
            {
                "n_corpus": n,
                "n_delta": delta,
                "modes": results,
                "admitted_sets_identical": sets_equal,
            }
        )
    )
    return 0 if sets_equal else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""One-off measurement (r10): steady-state per-batch cost of the
GLOBAL keep-first streaming doc dedup
(``streaming/ingest.py::stream_doc_dedup_to_parquet``) as the
ALL-SEEN feature index grows.

The claim under test: a delta batch's cost is bounded by the delta's
size plus its band-bucket collision fan-in with the index — reading
the index stays narrow (hash column; band keys) — so the per-batch
wall should grow sub-linearly in corpus size (file listing + wider
scans), nothing like the linear re-shingle the recompute-mode
admission ingest pays.

Method: bootstrap a corpus of N docs in one batch, then time ONE
2k-doc delta batch (half of it duplicating corpus docs) at several N.

Usage::

    python scripts/measure_doc_dedup_ingest.py [N ...]

Prints one JSON line per N.
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
    stream_doc_dedup_to_parquet,
)

BASE = "/tmp/spark_graft_doc_dedup_scale"
DELTA = 2_000


def _gen_wave(spark, start: int, count: int, dup_every: int | None, out: str):
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


def measure(spark, n: int) -> dict:
    root = f"{BASE}/n{n}"
    shutil.rmtree(root, ignore_errors=True)
    src = f"{root}/src"
    os.makedirs(src)
    _gen_wave(spark, 0, n, None, f"{root}/w0")
    _gen_wave(spark, n, DELTA, 2, f"{root}/w1")

    def _drain() -> None:
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            src
        )
        stream_doc_dedup_to_parquet(
            stream, f"{root}/corpus", f"{root}/ckpt", f"{root}/index"
        )

    for j, f in enumerate(sorted(os.listdir(f"{root}/w0"))):
        if f.endswith(".parquet"):
            shutil.copy(f"{root}/w0/{f}", f"{src}/a_{j}.parquet")
    t0 = time.monotonic()
    _drain()
    boot = time.monotonic() - t0
    for j, f in enumerate(sorted(os.listdir(f"{root}/w1"))):
        if f.endswith(".parquet"):
            shutil.copy(f"{root}/w1/{f}", f"{src}/b_{j}.parquet")
    t1 = time.monotonic()
    _drain()
    dt = time.monotonic() - t1
    admitted = (
        spark.read.parquet(f"{root}/corpus")
        .filter(F.col("ingest_batch") >= 1)
        .count()
    )
    shutil.rmtree(root, ignore_errors=True)
    return {
        "metric": "doc_dedup_ingest_scale",
        "n_corpus": n,
        "n_delta": DELTA,
        "bootstrap_s": round(boot, 2),
        "delta_batch_s": round(dt, 2),
        "delta_admitted": admitted,
    }


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [20_000, 100_000, 500_000]
    spark = get_spark(
        "doc_dedup_scale",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in ns:
        print(json.dumps(measure(spark, n)), flush=True)


if __name__ == "__main__":
    main()

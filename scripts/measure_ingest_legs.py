"""Leg-level timing for the streaming index-ingest entries (r15 opt).

Splits stream_ann_index_ingest / stream_pq_index_ingest into their
sequential legs — wave staging, per-batch build/merge (driven by the
same foreachBatch drain), and the post-drain search — so the
optimization round knows WHERE the entry's wall time goes before
touching anything (guide §1).

``doc`` mode (r16, the r15 verdict's #4): the per-BATCH split for
stream_doc_dedup_ingest, measured by draining the REAL
foreachBatch function one wave at a time — wave files land in the
source directory incrementally and each ``availableNow`` drain call
processes exactly the new file (the checkpoint carries the offsets),
so each leg is one micro-batch's admission + writes plus the stream
start/stop overhead (itself a number worth knowing).

Usage: python scripts/measure_ingest_legs.py [pq|ivf|doc] [--sf DIR]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.llm import vectors as lvec
from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import (
    release_all_staging,
)
from yelp_review_data_analysis_using_big_data_technologies_spark.plans.llm_queries import (
    _IVF_CELLS,
    _IVF_PROBE,
    _TOP_K,
    _load_embeddings,
    _query_set,
)
from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark

import __spark_entry__ as entrymod


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "pq"
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    spark = get_spark("measure-ingest-legs")
    emb = _load_embeddings(spark, sf_dir)
    base = os.path.join(tempfile.gettempdir(), f"graft_legs_{mode}")
    shutil.rmtree(base, ignore_errors=True)
    idx = os.path.join(base, "index")

    cols = ["vec_id", "embedding"]
    bounds = [None, *entrymod._ANN_INGEST_SPLITS, None]
    waves = []
    for k in range(len(entrymod._ANN_INGEST_SPLITS) + 1):
        wave = emb.select(*cols)
        if bounds[k] is not None:
            wave = wave.filter(F.col("vec_id") >= bounds[k])
        if bounds[k + 1] is not None:
            wave = wave.filter(F.col("vec_id") < bounds[k + 1])
        waves.append(wave)

    timings: dict[str, float] = {}

    def _leg(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        release_all_staging()
        return out

    emb.count()  # warmup scan

    if mode == "pq":
        _leg(
            "build(batch0)",
            lambda: lvec.build_ivfpq_index(
                waves[0], idx, n_cells=_IVF_CELLS, m=4, k_codes=16
            ),
        )
        _leg(
            "merge(batch1)",
            lambda: lvec.add_to_ivfpq_index(waves[1], idx),
        )
        _leg(
            "merge(batch2)",
            lambda: lvec.add_to_ivfpq_index(waves[2], idx),
        )
        _leg(
            "search",
            lambda: lvec.search_ivfpq_index(
                spark, idx, _query_set(emb), k=_TOP_K, n_probe=_IVF_PROBE, rerank=4
            )
            .orderBy("query_id", "rk")
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
    elif mode == "ivf":
        _leg(
            "build(batch0)",
            lambda: lvec.build_ivf_index(waves[0], idx, n_cells=_IVF_CELLS),
        )
        _leg("merge(batch1)", lambda: lvec.add_to_ivf_index(waves[1], idx))
        _leg("merge(batch2)", lambda: lvec.add_to_ivf_index(waves[2], idx))
        _leg(
            "search",
            lambda: lvec.search_ivf_index(
                spark, idx, _query_set(emb), k=_TOP_K, n_probe=_IVF_PROBE
            )
            .orderBy("query_id", "rk")
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )

    if mode == "doc":
        _doc_mode(spark, sf_dir, base, timings, _leg)
    timings["total"] = round(sum(timings.values()), 3)
    print(json.dumps({"mode": mode, "sf": sf_dir, "legs": timings}))


def _doc_mode(spark, sf_dir, base, timings, _leg) -> None:
    """Per-batch split for stream_doc_dedup_ingest: stage the entry's
    exact waves, then land one wave file at a time and re-drain — the
    checkpoint makes each drain process exactly the new batch."""
    import glob

    from yelp_review_data_analysis_using_big_data_technologies_spark.sources.readers import load_table
    from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.ingest import (
        stream_doc_dedup_to_parquet,
    )

    docs = load_table(spark, sf_dir, "documents")
    cols = ["doc_id", "text", "lang", "n_chars"]
    bounds = [None, *entrymod._INGEST_SPLITS, None]
    waves = []
    for k in range(len(entrymod._INGEST_SPLITS) + 1):
        wave = docs.select(*cols)
        if bounds[k] is not None:
            wave = wave.filter(F.col("doc_id") >= bounds[k])
        if bounds[k + 1] is not None:
            wave = wave.filter(F.col("doc_id") < bounds[k + 1])
        waves.append(wave)
    src = os.path.join(base, "src")
    os.makedirs(src, exist_ok=True)
    staged = []
    for k, wave in enumerate(waves):
        stage_dir = os.path.join(base, f"stage{k}")
        wave.coalesce(1).write.mode("overwrite").parquet(stage_dir)
        staged.append(glob.glob(os.path.join(stage_dir, "part-*.parquet"))[0])
    table = os.path.join(base, "corpus")
    ckpt = os.path.join(base, "ckpt")
    index = os.path.join(base, "index")
    schema = docs.select(*cols).schema
    for k, part in enumerate(staged):
        dst = os.path.join(src, f"wave{k}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_000_000_000 + 1000 * k,) * 2)

        def _drain():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            stream_doc_dedup_to_parquet(stream, table, ckpt, index)

        _leg(f"batch{k}", _drain)
    _leg(
        "readback",
        lambda: spark.read.parquet(table)
        .select("doc_id")
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )


if __name__ == "__main__":
    main()

"""Cumulative noop-forced attribution for the _freeze_manifest chain.

measure_freeze_audit.py forces each staged leg with ``count()``, which
column-prunes (guide §1.4) — text-heavy legs read artificially cheap.
This script forces each CUMULATIVE prefix of the freeze composition
with the noop sink (every column of every row), in a fresh plan per
prefix, so the marginal cost of each stage is the difference between
adjacent rows — the number the 22 s corpus_training_freeze headline
decomposes into.

Usage: python scripts/measure_freeze_stages.py [--sf DIR] [--runs N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark
from yelp_review_data_analysis_using_big_data_technologies_spark.sources.readers import load_table
from yelp_review_data_analysis_using_big_data_technologies_spark.llm import (
    dedup as ldd,
    decontam as ldec,
    text as ltx,
    sampling as lsmp,
    packing as lpk,
    staging as lstg,
)
from yelp_review_data_analysis_using_big_data_technologies_spark.plans.llm_queries import (
    _CORPUS_PRED,
    _BENCH_PRED,
    _MIXTURE_WEIGHTS,
)


def _prefix(spark, sf_dir: str, upto: str):
    """Build the freeze chain up to (and including) stage ``upto``."""
    docs = load_table(spark, sf_dir, "documents")
    clean = lstg.stage(ldd.exact_dedup(docs).drop("content_hash"))
    if upto == "exact_dedup":
        return clean
    deduped = lstg.stage(
        ldd.near_dup_removal(clean).filter(F.expr(_CORPUS_PRED))
    )
    if upto == "near_dup":
        return deduped
    bench = docs.filter(F.expr(_BENCH_PRED))
    decont = ldec.decontaminate(deduped, bench)
    if upto == "decontaminate":
        return decont
    good = lstg.stage(
        decont.filter(ltx.quality_score("text") > 0.5).select(
            "doc_id",
            "lang",
            ltx.token_count("text").cast("bigint").alias("n_tokens"),
        )
    )
    if upto == "quality":
        return good
    sampled = lstg.stage(
        lsmp.mixture_sample(
            good, _MIXTURE_WEIGHTS, domain_col="lang", tokens="n_tokens"
        )
    )
    if upto == "mixture":
        return sampled
    order = lsmp.corpus_shuffle(sampled)
    if upto == "shuffle":
        return order
    manifest = lstg.stage(sampled.join(order, on="doc_id"))
    if upto == "manifest_join":
        return manifest
    packed = lpk.pack_bins(
        manifest, budget=512, id_col="position", tokens_col="n_tokens"
    ).drop("n_tokens")
    if upto == "pack_bins":
        return packed
    out = manifest.join(packed, on="position").select(
        "doc_id", "lang", "n_tokens", "position", "shard",
        "offset_tokens", "bin_id",
    )
    if upto == "final_join":
        return out
    return out.orderBy("position")


STAGES = [
    "exact_dedup", "near_dup", "decontaminate", "quality", "mixture",
    "shuffle", "manifest_join", "pack_bins", "final_join", "ordered",
]


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    runs = 2
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    spark = get_spark("measure-freeze-stages")
    load_table(spark, sf_dir, "nation").count()

    out: dict[str, list[float]] = {}
    for stage_name in STAGES:
        out[stage_name] = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"freeze-prefix:{stage_name}")
            t0 = time.perf_counter()
            _prefix(spark, sf_dir, stage_name).write.format("noop").mode(
                "overwrite"
            ).save()
            out[stage_name].append(round(time.perf_counter() - t0, 3))
            lstg.release_staging(blocking=True)
            spark.catalog.clearCache()
        print(f"{stage_name:16s} {out[stage_name]}", flush=True)
    print(json.dumps({"prefix_noop": out, "sf": sf_dir, "runs": runs}))


if __name__ == "__main__":
    main()

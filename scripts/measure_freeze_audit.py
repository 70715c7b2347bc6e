"""Per-leg cost attribution for corpus_freeze_audit (r15 opt).

Times each staged sub-relation of the audit composition in production
order with a count()/noop force, so the 50 s headline cost can be
attributed to a leg before any restructuring (guide §1.1: measure
first, §1.3: isolate the computation).

Usage: python scripts/measure_freeze_audit.py [--sf DIR]
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
    staging as lstg,
)
from yelp_review_data_analysis_using_big_data_technologies_spark.plans.llm_queries import (
    _CORPUS_PRED,
    _BENCH_PRED,
    _MIXTURE_WEIGHTS,
)


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    spark = get_spark("measure-freeze-audit")
    load_table(spark, sf_dir, "nation").count()

    t: dict[str, float] = {}

    def leg(name, df):
        spark.sparkContext.setJobDescription(f"audit-leg:{name}")
        t0 = time.perf_counter()
        n = df.count()
        t[name] = round(time.perf_counter() - t0, 3)
        print(f"{name:28s} {t[name]:8.3f}s  rows={n}", flush=True)
        return df

    docs = load_table(spark, sf_dir, "documents")
    clean = lstg.stage(ldd.exact_dedup(docs).drop("content_hash"))
    leg("exact_dedup", clean)
    nd_surv = lstg.stage(ldd.near_dup_removal(clean))
    leg("near_dup_removal", nd_surv)
    corpus = lstg.stage(nd_surv.filter(F.expr(_CORPUS_PRED)))
    leg("corpus_pred", corpus)
    bench = docs.filter(F.expr(_BENCH_PRED))
    decont = lstg.stage(ldec.decontaminate(corpus, bench))
    leg("decontaminate", decont)
    good = lstg.stage(
        decont.filter(ltx.quality_score("text") > 0.5).select(
            "doc_id",
            "lang",
            ltx.token_count("text").cast("bigint").alias("n_tokens"),
        )
    )
    leg("quality_gate", good)
    kept = lstg.stage(
        lsmp.mixture_sample(
            good, _MIXTURE_WEIGHTS, domain_col="lang", tokens="n_tokens"
        )
    )
    leg("mixture_sample", kept)

    def _tag(df, stage):
        return df.select("doc_id", "text", F.lit(stage).alias("stage"))

    drops = lstg.stage(
        _tag(docs.join(clean.select("doc_id"), "doc_id", "left_anti"), "exact_dup")
        .unionByName(_tag(clean.join(nd_surv.select("doc_id"), "doc_id", "left_anti"), "near_dup"))
        .unionByName(_tag(nd_surv.filter(~F.expr(_CORPUS_PRED)), "benchmark_eval"))
        .unionByName(_tag(corpus.join(decont.select("doc_id"), "doc_id", "left_anti"), "contaminated"))
        .unionByName(_tag(decont.join(good.select("doc_id"), "doc_id", "left_anti"), "low_quality"))
    )
    leg("drops_union", drops)

    ntok = ltx.token_count("text").cast("bigint")
    leg(
        "stage_rows_agg",
        drops.groupBy("stage").agg(F.count(F.lit(1)).alias("n"), F.sum(ntok).alias("tok")),
    )
    leg("mix_drop_agg", good.join(kept.select("doc_id"), "doc_id", "left_anti").agg(F.count(F.lit(1))))
    leg(
        "lowq_overlap",
        drops.filter(F.col("stage") != "low_quality").filter(~(ltx.quality_score("text") > 0.5)),
    )
    cand = drops.filter(F.col("stage").isin("exact_dup", "near_dup")).filter(F.expr(_CORPUS_PRED))
    leg(
        "contam_overlap",
        cand.join(
            ldec.contamination_overlap(cand, bench).select("doc_id"),
            "doc_id",
            "left_semi",
        ),
    )
    lstg.release_staging(blocking=True)
    print(json.dumps({"legs": t, "total": round(sum(t.values()), 3), "sf": sf_dir}))


if __name__ == "__main__":
    main()

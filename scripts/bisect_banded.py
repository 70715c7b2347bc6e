"""Stage-level timing bisect for ``doc_near_dup_banded`` (VERDICT r4 #3).

The entry's median drifted 7.74 -> 9.68 s across rounds 3-4 at sf0.1
with an unchanged plan.  This script splits the operator into its three
physical stages and times each independently (N runs, medians):

  1. ``stage``  — shingle + MinHash signature staging materialization
                  (count() on the persisted base relation);
  2. ``bands``  — band-key explode + bucket self-join + pair dedup
                  (count() on the candidate pairs, staged base warm);
  3. ``verify`` — shingle-set join-back + exact Jaccard + threshold
                  (noop write of the final result, base warm).

and also the full end-to-end entry under the bench protocol for
reference.  Run:  python scripts/bisect_banded.py [runs]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark
from yelp_review_data_analysis_using_big_data_technologies_spark.sources.readers import load_table
from yelp_review_data_analysis_using_big_data_technologies_spark.llm import dedup as ldedup
from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import release_staging


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bisect-banded")
    load_table(spark, sf_dir, "nation").count()  # warmup

    samples: dict[str, list[float]] = {k: [] for k in ("stage", "bands", "verify", "full")}

    for _ in range(runs):
        docs = load_table(spark, sf_dir, "documents")

        # -- stage 1: staging materialization
        t0 = time.perf_counter()
        base, band_keys = ldedup._banded_keys(docs, "doc_id", "text", 6, 3, 3)
        base.count()
        samples["stage"].append(round(time.perf_counter() - t0, 3))

        # -- stage 2: band self-join (base warm)
        t0 = time.perf_counter()
        cands = (
            band_keys.alias("a")
            .join(band_keys.alias("b"), on="band_key")
            .filter(F.col("a.__id") < F.col("b.__id"))
            .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        n_cands = cands.count()
        samples["bands"].append(round(time.perf_counter() - t0, 3))

        # -- stage 3: verify (base warm; includes re-running the band join
        #    inside the full plan, so subtract bands to isolate verify cost)
        t0 = time.perf_counter()
        sh = base.select("__id", "__sh", "__sz")
        verified = (
            cands.join(sh.withColumnsRenamed({"__id": "id_a", "__sh": "sh_a", "__sz": "sz_a"}), on="id_a")
            .join(sh.withColumnsRenamed({"__id": "id_b", "__sh": "sh_b", "__sz": "sz_b"}), on="id_b")
            .withColumn("__i", F.size(F.array_intersect("sh_a", "sh_b")))
            .withColumn("jaccard", F.round(F.col("__i") / (F.col("sz_a") + F.col("sz_b") - F.col("__i")), 6))
            .filter(F.col("jaccard") >= 0.5)
            .select("id_a", "id_b", "jaccard")
        )
        verified.write.format("noop").mode("overwrite").save()
        samples["verify"].append(round(time.perf_counter() - t0, 3))
        release_staging(blocking=True)
        spark.catalog.clearCache()

        # -- full entry under bench protocol
        t0 = time.perf_counter()
        ldedup.near_dup_pairs_banded(docs).write.format("noop").mode("overwrite").save()
        samples["full"].append(round(time.perf_counter() - t0, 3))
        release_staging(blocking=True)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        spark.range(1).count()

    print(json.dumps({
        "medians": {k: round(statistics.median(v), 3) for k, v in samples.items()},
        "samples": samples,
        "n_candidates": n_cands,
        "runs": runs,
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()

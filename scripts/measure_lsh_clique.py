"""Measure the banded-LSH degenerate-clique regime (VERDICT r7 ask #3).

A boilerplate-heavy crawl puts 30-50% of documents into ONE near-dup
clique (same template, tiny per-doc edits — exact dedup does NOT
collapse them).  Every clique member lands in the same LSH band
buckets, so the band self-join degenerates to clique² candidate
pairs: the one 100-TB scale edge no prior measurement covered.

This script builds corpora of n docs with ``frac`` of them clique
members (template + 2 perturbed tokens, so pairwise Jaccard stays
above threshold but hashes differ), and measures candidate-pair
count and wall time for :func:`near_dup_pairs_banded` with and
without the ``max_bucket`` cap.

Usage::

    python scripts/measure_lsh_clique.py [n ...]     # default 2000 4000 8000
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.llm import dedup as ldd
from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import release_staging
from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark

TEMPLATE = (
    "terms of service this website uses cookies to improve your "
    "experience by continuing you agree to our privacy policy and "
    "the collection of usage data for analytics purposes contact "
    "support for questions about your account settings and billing"
)

WORDS = (
    "spark query join filter window stream table scan merge sort "
    "group row data slow fast small large key order part customer"
).split()


def build(spark, n: int, frac: float = 0.4):
    """frac of n docs = TEMPLATE with 2 hash-perturbed tokens (near-dup
    clique, exact-dedup-proof); rest = hash-shuffled random sentences."""
    base = spark.range(n).withColumnRenamed("id", "doc_id")
    w = F.array(*[F.lit(x) for x in WORDS])
    rand_words = F.transform(
        F.sequence(F.lit(1), F.lit(30)),
        lambda i: F.element_at(
            w, (F.pmod(F.xxhash64(F.col("doc_id"), i), F.lit(len(WORDS))) + 1).cast("int")
        ),
    )
    clique_text = F.concat(
        F.lit(TEMPLATE + " edit "),
        F.element_at(w, (F.pmod(F.xxhash64("doc_id"), F.lit(len(WORDS))) + 1).cast("int")),
        F.lit(" "),
        F.element_at(w, (F.pmod(F.xxhash64("doc_id", F.lit(3)), F.lit(len(WORDS))) + 1).cast("int")),
    )
    return base.select(
        "doc_id",
        F.when(
            F.pmod(F.xxhash64("doc_id", F.lit(9)), F.lit(1000)) < int(frac * 1000),
            clique_text,
        )
        .otherwise(F.concat_ws(" ", rand_words))
        .alias("text"),
    )


def run(spark, docs, max_bucket):
    t0 = time.perf_counter()
    pairs = ldd.near_dup_pairs_banded(docs, max_bucket=max_bucket)
    n_pairs = pairs.count()
    dt = time.perf_counter() - t0
    release_staging()
    return n_pairs, round(dt, 2)


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [2000, 4000, 8000]
    spark = get_spark("lsh_clique")
    print(f"{'n':>7} {'clique':>7} | {'uncapped pairs':>14} {'s':>7} | "
          f"{'capped pairs':>12} {'s':>7}")
    for n in sizes:
        docs = build(spark, n).cache()
        n_clique = docs.filter(F.col("text").startswith("terms of")).count()
        up, ut = run(spark, docs, max_bucket=None)
        cp, ct = run(spark, docs, max_bucket=1000)
        print(f"{n:>7} {n_clique:>7} | {up:>14} {ut:>7} | {cp:>12} {ct:>7}",
              flush=True)
        docs.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

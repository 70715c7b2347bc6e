"""Probe: extreme-magnitude metadata + megabyte documents.

Round-8 extra injection class.  Two shapes:

- corrupt ``n_chars`` metadata: NEGATIVE counts (impossible — silent
  weight/packing skew) and NEAR-INT64 counts (5e18: two such rows
  overflow any BIGINT sum — Spark ANSI job-aborts where DuckDB
  silently promotes to HUGEINT, the engine-divergence double bill).
- one megabyte-scale document (200k tokens): regex tokenizers,
  shingle list construction, and signature folds at three orders of
  magnitude beyond fixture norms.

Usage::

    python scripts/probe_extreme_magnitudes.py [entry ...]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import release_staging
from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark
from yelp_review_data_analysis_using_big_data_technologies_spark.sources.readers import TABLES

import __spark_entry__ as entrymod
import importlib.util

_spec = importlib.util.spec_from_file_location(
    "check_oracle",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "check_oracle.py"),
)
check = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check)

SRC = "/root/testdata/sf0.001"

ENTRIES = [
    # n_chars consumers: sums, weights, quality bands
    "pipeline_split_panel",
    "doc_weighted_sample",
    "corpus_mixture_sample",
    "doc_profile",
    "corpus_keep_best",
    # token-count sums / packing
    "doc_pack_bins",
    "doc_chunk_dedup",
    "doc_token_chunks",
    # giant-doc text paths
    "doc_text_stats",
    "doc_token_counts",
    "doc_fingerprint",
    "doc_lang_id",
    "doc_quality_bands",
    "doc_repetition_profile",
    "doc_shingle_top10",
    "doc_tfidf_top_terms",
    "doc_exact_dedup",
    "doc_near_dup_banded",
]


def build_fixture(out: str) -> None:
    con = duckdb.connect()
    # ~21k-token document (~140 KB) — two orders of magnitude past the
    # fixture norm.  NOT megabyte-scale: the DuckDB twins build
    # shingles with per-element list indexing inside a lambda, which
    # is quadratic in tokens (a 200k-token doc ground the ORACLE, not
    # the engine, for >15 min at 20 GB RSS) — the oracle's practical
    # ceiling, documented here deliberately.
    giant = " ".join(
        f"tok{i % 997} word{i % 89} item{i % 53}" for i in range(7000)
    )
    for t in TABLES:
        p = os.path.join(SRC, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        if t == "documents":
            sel = (
                "SELECT * REPLACE ((CASE "
                "WHEN hash(doc_id) % 19 = 0 THEN -42 "
                "WHEN hash(doc_id) % 19 = 1 THEN 5000000000000000000 "
                "ELSE n_chars END) AS n_chars) "
                f"FROM read_parquet('{p}') "
                "UNION ALL "
                f"SELECT 9100001, '{giant}', 'en', 'src0', {len(giant)}"
            )
        else:
            sel = f"SELECT * FROM read_parquet('{p}')"
        con.execute(f"COPY ({sel}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    n_bad = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/documents.parquet') "
        "WHERE n_chars < 0 OR n_chars > 4000000000000000000 "
        "OR len(text) > 1000000"
    ).fetchone()[0]
    assert n_bad > 2, "magnitude injection too sparse"
    print(f"fixture: {n_bad} extreme rows")
    con.close()


def main() -> int:
    only = set(sys.argv[1:])
    out = tempfile.mkdtemp(prefix="magnitude_")
    build_fixture(out)
    spark = get_spark("probe_magnitude")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(out, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name in ENTRIES:
        if only and name not in only:
            continue
        try:
            probs = check.compare(name, spark, con, out, qs[name], oracles.get(name))
        except Exception as exc:  # noqa: BLE001
            probs = [f"[{name}] EXCEPTION: {type(exc).__name__}: "
                     f"{str(exc)[:300]}"]
        finally:
            release_staging()
        print(f"  {name}: {'FAIL' if probs else 'ok'}", flush=True)
        failures.extend(probs)
    print()
    for f in failures:
        print(f)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

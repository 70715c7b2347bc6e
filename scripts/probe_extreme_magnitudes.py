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

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from _probe_common import SRC, TABLES, run_probe


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


if __name__ == "__main__":
    import sys as _sys

    raise SystemExit(
        run_probe("magnitude", build_fixture, ENTRIES, only=_sys.argv[1:])
    )

"""Probe: ragged / zero / empty / NULL embedding vectors.

Round-8 extra injection class.  The r7 non-finite campaign covered
NaN/Inf/NULL COMPONENTS inside well-shaped 64-dim vectors; this probe
covers malformed SHAPES real embedding pipelines emit: truncated
vectors (wrong dim — a writer bug or schema drift), empty arrays,
NULL embeddings, and all-zero vectors (a failed encoder batch — norm
0 makes cosine 0/0).  Divergence candidates: ``F.zip_with`` pads the
shorter array with NULL where DuckDB ``list_dot_product`` may raise
or truncate; norm-0 division NaN-vs-error; seeded-plane LSH over
short arrays.

Usage::

    python scripts/probe_ragged_vectors.py [entry ...]
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
    "vec_top_k_bruteforce",
    "vec_top_k_ann_signlsh",
    "vec_top_k_ann_ivf",
    "vec_cosine_near_dup",
    "vec_cosine_near_dup_pinned",
    "vec_centroid_distance",
    "vec_quantize_int8",
    "vec_ivf_index_search",
    "vec_ann_exhaustive_equiv",
    "corpus_semantic_dedup",
]


def build_fixture(out: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SRC, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        if t == "embeddings":
            sel = (
                "SELECT * REPLACE ((CASE "
                # truncated to 3 dims (writer bug / schema drift)
                "WHEN hash(vec_id) % 23 = 0 THEN embedding[1:3] "
                # empty array
                "WHEN hash(vec_id) % 23 = 1 THEN CAST([] AS FLOAT[]) "
                # NULL embedding
                "WHEN hash(vec_id) % 23 = 2 THEN NULL "
                # all-zero vector (failed encoder batch): norm 0
                "WHEN hash(vec_id) % 23 = 3 THEN "
                "list_transform(embedding, x -> CAST(0.0 AS FLOAT)) "
                # one extra dim (concat drift)
                "WHEN hash(vec_id) % 23 = 4 THEN "
                "embedding || [CAST(0.25 AS FLOAT)] "
                f"ELSE embedding END) AS embedding) FROM read_parquet('{p}')"
            )
        else:
            sel = f"SELECT * FROM read_parquet('{p}')"
        con.execute(f"COPY ({sel}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    n_bad = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/embeddings.parquet') "
        "WHERE embedding IS NULL OR len(embedding) <> 64"
    ).fetchone()[0]
    assert n_bad > 0, "no ragged vectors injected"
    print(f"fixture: {n_bad} ragged/NULL vectors")
    con.close()


def main() -> int:
    only = set(sys.argv[1:])
    out = tempfile.mkdtemp(prefix="ragged_vec_")
    build_fixture(out)
    spark = get_spark("probe_ragged")
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
            probs = [f"[{name}] EXCEPTION: {type(exc).__name__}: {exc}"]
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

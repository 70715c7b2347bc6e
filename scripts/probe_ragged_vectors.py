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

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from _probe_common import SRC, TABLES, run_probe


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


if __name__ == "__main__":
    import sys as _sys

    raise SystemExit(
        run_probe("ragged_vec", build_fixture, ENTRIES, only=_sys.argv[1:])
    )

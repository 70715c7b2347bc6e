"""Probe: duplicate / NULL primary ids through survivor selection.

Round-8 extra injection class (beyond the three VERDICT asks).  Every
dedup/CDC survivor pick is "deterministic" via a tie-break on the
table's id column — which the fixtures guarantee unique.  Real data
does not: replayed loads duplicate ids, and NULL ids appear after bad
joins.  When two rows share BOTH the dedup key and the id, Spark's
``min(struct(...))`` picks the lexicographic minimum over ALL carried
columns, while a DuckDB ``row_number() OVER (ORDER BY id)`` twin
breaks the remaining tie ARBITRARILY — a latent cross-engine
divergence no unique-id fixture can see.

The fixture duplicates a hash-chosen slice of documents.doc_id and
events.event_id with DIFFERENT payload (text suffix / value bump),
NULLs a few ids, and replays the survivor-selection twins.

Usage::

    python scripts/probe_dup_ids.py [entry ...]
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
    # documents: dedup survivor selection keyed by doc_id tie-breaks
    "doc_exact_dedup",
    "doc_normalized_dedup",
    "doc_near_dup_removal",
    "corpus_clean_pipeline",
    "corpus_keep_best",
    "doc_dup_clusters_panel",
    "doc_dedup_delta",
    "pipeline_split_panel",
    "doc_weighted_sample",
    "doc_pack_bins",
    # events: latest-state / keyed dedup on event_id tie-breaks
    "cdc_latest_state",
    "cdc_scd2_history",
    "dedup_keyed_deterministic",
    "dedup_full_row",
    "events_sessionize",
    "events_transition_matrix",
    "events_analytics_panel",
]


def build_fixture(out: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SRC, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        if t == "documents":
            # same doc_id, different text/n_chars; plus NULL ids
            sel = (
                f"SELECT * FROM read_parquet('{p}') "
                "UNION ALL "
                "SELECT doc_id, text || ' replay', lang, source, "
                "n_chars + 7 "
                f"FROM read_parquet('{p}') WHERE hash(doc_id) % 11 = 0 "
                "UNION ALL "
                "SELECT NULL, 'orphan row one', 'en', 'src0', 14 "
                "UNION ALL "
                "SELECT NULL, 'orphan row two', 'de', 'src1', 14"
            )
        elif t == "events":
            sel = (
                f"SELECT * FROM read_parquet('{p}') "
                "UNION ALL "
                "SELECT event_id, ts, user_id, event_type, value + 0.5, "
                "props "
                f"FROM read_parquet('{p}') WHERE hash(event_id) % 13 = 0 "
                "UNION ALL "
                "SELECT NULL, TIMESTAMP '2024-01-15 12:00:00', 1, "
                "'click', 1.0, NULL"
            )
        else:
            sel = f"SELECT * FROM read_parquet('{p}')"
        con.execute(f"COPY ({sel}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    n_dup = con.execute(
        f"SELECT count(*) - count(DISTINCT doc_id) "
        f"FROM read_parquet('{out}/documents.parquet') WHERE doc_id IS NOT NULL"
    ).fetchone()[0]
    assert n_dup > 0, "no duplicate ids injected"
    print(f"fixture: documents has {n_dup} duplicated doc_ids")
    con.close()


def main() -> int:
    only = set(sys.argv[1:])
    out = tempfile.mkdtemp(prefix="dup_ids_")
    build_fixture(out)
    spark = get_spark("probe_dup_ids")
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

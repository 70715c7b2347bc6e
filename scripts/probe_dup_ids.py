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

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from _probe_common import SRC, TABLES, run_probe


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


if __name__ == "__main__":
    import sys as _sys

    raise SystemExit(
        run_probe("dup_ids", build_fixture, ENTRIES, only=_sys.argv[1:])
    )

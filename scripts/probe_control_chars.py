"""Probe: NUL bytes, BOM, and C0/DEL control characters in text.

Round-8 extra injection class.  Scraped corpora carry every byte
UTF-8 allows: embedded NUL (binary spillover — the classic
C-string truncator), a BOM glued to the first token, bells/backspaces
and DEL, and vertical-tab/form-feed whitespace cousins that \\s+
tokenizers may or may not split on.  Divergence candidates: regex
whitespace classes (Java vs RE2 on \\x0b/\\x0c), NUL through
hashing/length/substr, BOM changing the first shingle.

The fixture is built with pyarrow (DuckDB's SQL literals cannot spell
NUL, but both engines READ it from parquet fine — verified).

Usage::

    python scripts/probe_control_chars.py [entry ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from _probe_common import SRC, TABLES, run_probe

#: (modulus-class, python replacement text)
DIRTY = [
    (0, "has\x00nul byte inside"),
    (1, "﻿bom glued to first token"),
    (2, "bell\x07 backspace\x08 escape\x1b chars"),
    (3, "del\x7fchar and unit sep\x1f here"),
    (4, "vertical\x0btab and form\x0cfeed"),
    (5, "nul at end\x00"),
    (6, "\x00nul at start"),
    (7, "crlf\r\nand bare cr\r here"),
]

ENTRIES = [
    "doc_exact_dedup",
    "doc_normalized_dedup",
    "doc_unicode_normalized",
    "doc_near_dup_banded",
    "doc_simhash_near_dup",
    "doc_ngram_jaccard",
    "doc_text_stats",
    "doc_token_counts",
    "doc_token_chunks",
    "doc_lang_id",
    "doc_fingerprint",
    "doc_quality_bands",
    "doc_profile",
    "doc_repetition_profile",
    "doc_pii_redact",
    "doc_decontaminated",
    "doc_tfidf_top_terms",
    "doc_prefix_contained",
    "corpus_clean_pipeline",
]


def build_fixture(out: str) -> None:
    import pyarrow.parquet as pq

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SRC, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        if t == "documents":
            tbl = pq.read_table(p)
            texts = tbl.column("text").to_pylist()
            ids = tbl.column("doc_id").to_pylist()
            by_class = dict(DIRTY)

            def inject(i, txt):
                cls = (i * 2654435761) % 29
                if txt is not None and cls in by_class:
                    return by_class[cls]
                return txt

            new_texts = [inject(i, txt) for i, txt in zip(ids, texts)]
            import pyarrow as pa

            tbl = tbl.set_column(
                tbl.schema.get_field_index("text"),
                "text",
                pa.array(new_texts, type=pa.string()),
            )
            pq.write_table(tbl, f"{out}/{t}.parquet")
        else:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{p}')) "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
            )
    n_bad = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/documents.parquet') "
        "WHERE contains(text, chr(7)) OR contains(text, chr(11)) "
        "OR length(replace(text, chr(1), '')) <> length(text)"
    ).fetchone()[0]
    # NUL-carrying rows can't be counted via chr(0) in DuckDB SQL;
    # count them python-side
    import pyarrow.parquet as pq2

    texts = pq2.read_table(f"{out}/documents.parquet").column("text").to_pylist()
    n_nul = sum(1 for s in texts if s and "\x00" in s)
    assert n_nul > 0, "no NUL strings injected"
    print(f"fixture: {n_nul} NUL rows, {n_bad} other control-char rows")
    con.close()


if __name__ == "__main__":
    raise SystemExit(
        run_probe("ctrl_chars", build_fixture, ENTRIES, only=sys.argv[1:])
    )

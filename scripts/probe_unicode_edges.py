"""Probe: unicode normalization / collation edges through text twins.

Round-8 injection class (VERDICT r7 ask #2b).  Primitive recon found
two real cross-engine casefold divergences — ``upper('ß')`` (Java
'SS' vs utf8proc 'ẞ') and ``lower('İ')`` (Java 'i'+U+0307 vs utf8proc
'i') — and the text entries have never been replayed over NFC/NFD
twin pairs, stacked combining marks, non-BMP surrogate-pair letters,
ZWJ emoji clusters, or regional-indicator flags.  This probe
hash-injects those shapes into ``documents.text`` (including literal
NFC/NFD twins of the SAME sentence on different docs, which must
dedup the SAME WAY in both engines — byte-distinct everywhere) and
replays every text-consuming twin via the real gate comparator.

Usage::

    python scripts/probe_unicode_edges.py [entry ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from _probe_common import SRC, TABLES, run_probe

import unicodedata

_SENT = "Élan café résumé naïve coöperate São Paulo Żółć"
NFC_SENT = unicodedata.normalize("NFC", _SENT)
NFD_SENT = unicodedata.normalize("NFD", _SENT)
assert NFC_SENT != NFD_SENT

#: (modulus-class, python replacement text)
DIRTY = [
    (0, NFC_SENT),                                # NFC twin …
    (1, NFD_SENT),                                # … NFD twin (same sentence)
    (2, "İstanbul ıssız Diyarbakır kapı"),        # Turkish dotted/dotless I
    (3, "straße STRASSE Straße MASSE maße"),      # ß casefold family
    (4, "é̂̃ stacked q̣̇ marks"),  # stacked Mn
    (5, "\U0001d54a\U0001d55a\U0001d552\U0001d55b math \U0001d4c1etters"),  # non-BMP
    (6, "family \U0001F468‍\U0001F469‍\U0001F467 zwj \U0001F3F3️‍\U0001F308"),  # ZWJ
    (7, "flags \U0001F1FA\U0001F1F8 \U0001F1E9\U0001F1EA \U0001F1EF\U0001F1F5"),  # regional indicators
]

ENTRIES = [
    "doc_exact_dedup",
    "doc_normalized_dedup",
    "doc_near_dup_banded",
    "doc_ngram_jaccard",
    "doc_simhash_near_dup",
    "doc_simhash_buckets",
    "doc_near_dup_removal",
    "doc_dedup_delta",
    "doc_text_stats",
    "doc_token_counts",
    "doc_token_chunks",
    "doc_chunk_dedup",
    "doc_lang_id",
    "doc_fingerprint",
    "doc_quality_bands",
    "doc_profile",
    "doc_text_panel",
    "doc_repetition_profile",
    "doc_pii_redact",
    "doc_decontaminated",
    "doc_tfidf_top_terms",
    "doc_pack_bins",
    "doc_dup_clusters_panel",
    "corpus_clean_pipeline",
    "corpus_keep_best",
    "pipeline_split_panel",
    "doc_weighted_sample",
    "stream_dedup_ingest",
]


def build_fixture(out: str) -> None:
    con = duckdb.connect()
    whens = " ".join(
        "WHEN hash(doc_id) % 29 = {k} THEN '{lit}'".format(
            k=k, lit=txt.replace("'", "''")
        )
        for k, txt in DIRTY
    )
    for t in TABLES:
        p = os.path.join(SRC, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        if t == "documents":
            sel = (
                f"SELECT * REPLACE ((CASE {whens} ELSE text END) AS text) "
                f"FROM read_parquet('{p}')"
            )
        else:
            sel = f"SELECT * FROM read_parquet('{p}')"
        con.execute(f"COPY ({sel}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    n_dirty = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/documents.parquet') "
        "WHERE text LIKE '%İstanbul%' OR text LIKE '%café%' OR text LIKE '%straße%'"
    ).fetchone()[0]
    assert n_dirty > 0, "unicode injection replaced nothing"
    print(f"fixture: {n_dirty} unicode-injected docs")
    con.close()


if __name__ == "__main__":
    import sys as _sys

    raise SystemExit(
        run_probe("unicode", build_fixture, ENTRIES, only=_sys.argv[1:])
    )

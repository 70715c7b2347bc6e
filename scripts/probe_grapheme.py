"""Probe: grapheme clusters / astral-plane sequences in text.

Round-8 injection class i (the multi-code-point sibling of the
control-char and unicode-normalization classes).  Real web text
carries user-perceived characters that span SEVERAL code points:
ZWJ-joined family emoji, regional-indicator flag pairs, skin-tone
modifiers, VS16 variation sequences, and stacked combining marks with
no NFC precomposition.  These are exactly where "character" semantics
fork — an engine that counts/slices GRAPHEME CLUSTERS disagrees with
one that works in CODE POINTS.

Primitive census (run with ``--census``): Spark and DuckDB agree on
``length`` / ``substring`` / ``upper`` / ``lower`` (all code-point
based in both) but DIVERGE on ``reverse`` — DuckDB reverses grapheme
clusters (a ZWJ family survives intact), Spark reverses code points
(the sequence is torn).  No twin uses ``reverse``; the pinned suite
(tests/test_grapheme_injection.py) documents the fork so a future
twin never reaches for it blind.

Usage::

    python scripts/probe_grapheme.py [entry ...]
    python scripts/probe_grapheme.py --census   # primitive census only
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from _probe_common import SRC, TABLES, run_probe

ZWJ = "‍"

#: (modulus-class, python replacement text)
DIRTY = [
    (0, f"family \U0001F468{ZWJ}\U0001F469{ZWJ}\U0001F467 here"),
    (1, "flag \U0001F1FA\U0001F1F8 day"),
    (2, "\U0001F44B\U0001F3FC wave first"),  # cluster as FIRST char
    (3, "hearts ❤️ ❤️ end"),
    (4, "accé́nt stack"),  # no precomposed NFC form
    (5, f"\U0001F468{ZWJ}\U0001F469{ZWJ}\U0001F466"),  # text = 1 cluster
]

ENTRIES = [
    "doc_exact_dedup",
    "doc_normalized_dedup",
    "doc_unicode_normalized",
    "doc_near_dup_banded",
    "doc_ngram_jaccard",
    "doc_simhash_near_dup",
    "doc_text_stats",
    "doc_token_counts",
    "doc_token_chunks",
    "doc_lang_id",
    "doc_fingerprint",
    "doc_quality_bands",
    "doc_profile",
    "doc_repetition_profile",
    "doc_tfidf_top_terms",
    "doc_prefix_contained",
    "doc_lm_quality",
    "doc_gopher_rules",
    "corpus_clean_pipeline",
]

CENSUS_CASES = {
    "astral": "x\U0001F600y",
    "zwj_family": f"\U0001F468{ZWJ}\U0001F469{ZWJ}\U0001F467{ZWJ}\U0001F466",
    "flag": "\U0001F1FA\U0001F1F8",
    "skin": "\U0001F44B\U0001F3FC",
    "vs16": "❤️",
    "combining": "é́",
}


def census() -> int:
    """Compare the string primitives both engines expose on each
    grapheme shape; print AGREE/DIVERGE per case."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark

    spark = get_spark("probe_grapheme_census")
    con = duckdb.connect()
    bad = 0
    for name, s in CENSUS_CASES.items():
        row = spark.sql(
            "SELECT length(x) AS l, substring(x,1,1) AS s1, "
            "substring(x,2,2) AS s2, upper(x) AS u, lower(x) AS lo, "
            "reverse(x) AS rv FROM VALUES (:x) t(x)",
            args={"x": s},
        ).collect()[0]
        d = con.execute(
            "SELECT length(?), substring(?,1,1), substring(?,2,2), "
            "upper(?), lower(?), reverse(?)",
            [s] * 6,
        ).fetchone()

        diffs = [
            f"{fn} {got!r} vs {exp!r}"
            for fn, got, exp in [
                ("length", row.l, d[0]),
                ("substring1", row.s1, d[1]),
                ("substring2", row.s2, d[2]),
                ("upper", row.u, d[3]),
                ("lower", row.lo, d[4]),
                ("reverse", row.rv, d[5]),
            ]
            if got != exp
        ]
        print(f"  {name}: " + ("AGREE" if not diffs else "DIVERGE: " + "; ".join(diffs)))
        bad += bool(diffs)
    print(
        "\ncensus: reverse is the only divergent primitive"
        if bad else "\ncensus: full agreement"
    )
    return 0


def build_fixture(out: str) -> None:
    con = duckdb.connect()
    by_class = dict(DIRTY)
    whens = " ".join(
        f"WHEN hash(doc_id) % 23 = {k} THEN ?" for k in by_class
    )
    params = list(by_class.values())
    for t in TABLES:
        p = os.path.join(SRC, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        if t == "documents":
            sel = (
                f"SELECT * REPLACE ((CASE {whens} ELSE text END) AS text) "
                f"FROM read_parquet('{p}')"
            )
            con.execute(
                f"COPY ({sel}) TO '{out}/{t}.parquet' (FORMAT PARQUET)", params
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{p}')) "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
            )
    con.close()


if __name__ == "__main__":
    if "--census" in sys.argv[1:]:
        sys.exit(census())
    sys.exit(run_probe("grapheme", build_fixture, ENTRIES, sys.argv[1:]))

"""Probe: CSV/JSON quoting + control-character edges through the
ingest round-trips.

Round-8 extra injection class.  The round-trip entries prove
losslessness against the ORIGINAL parquet, but only on fixture
content that never exercises the quoting machinery.  Real warehouse
strings carry embedded delimiters, double quotes, CR/LF newlines
(the classic CSV row-splitter), backslashes, tabs, and unicode —
the shapes that break naive CSV readers (Spark needs
``multiLine=true`` to reassemble quoted embedded newlines) and JSON
escaping.

Injects those shapes into ``nation.n_name`` (CSV leg, all edge
classes cycled through the tiny table), ``documents.text`` (JSON
leg), and ``orders.o_orderpriority`` (the ORC PARTITION column —
hostile values as directory names), replays the round-trip twins via
the gate comparator, and ALSO does a direct staged-vs-original frame
equality per format (the aggregate entries alone cannot see value
corruption that preserves row structure).

Found (and fixed, r8): the CSV leg was lossy two ways — embedded
newlines split rows on read (multiLine now defaults on) and Spark's
CSV WRITER trims whitespace by default (pinned off in write_csv).

Usage::

    python scripts/probe_ingest_quoting.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from _probe_common import SRC, TABLES, run_probe

#: SQL literals of the hostile strings (DuckDB escaped-string syntax).
EDGES = [
    "e'comma, inside'",
    "e'double \"quote\" mark'",
    "e'embedded\\nnewline'",
    "e'crlf\\r\\nline'",
    "e'back\\\\slash and tab\\there'",
    "e'single '' quote'",
    "e'trailing space '",
    "e'ünïcode, \"mixed\"\\nall'",
]

ENTRIES = [
    "csv_ingest_roundtrip",
    "json_ingest_roundtrip",
    "orc_ingest_roundtrip",
    "ingest_roundtrip_panel",
]


def build_fixture(out: str) -> None:
    con = duckdb.connect()

    def whens(pk, col):
        return " ".join(
            f"WHEN hash({pk}) % 17 = {i} THEN {lit}"
            for i, lit in enumerate(EDGES)
        ) + f" ELSE {col} END"

    for t in TABLES:
        p = os.path.join(SRC, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        if t == "nation":
            # nation is tiny (25 rows): cycle ALL edge classes through
            # ~1/3 of the rows so every class rides the CSV leg
            cyc = " ".join(
                f"WHEN hash(n_nationkey) % 8 = {i} THEN {lit}"
                for i, lit in enumerate(EDGES)
            )
            sel = (
                "SELECT * REPLACE ((CASE WHEN hash(n_nationkey) % 3 = 0 "
                f"THEN (CASE {cyc} END) ELSE n_name END) AS n_name) "
                f"FROM read_parquet('{p}')"
            )
        elif t == "documents":
            sel = (
                "SELECT * REPLACE ("
                f"(CASE {whens('doc_id', 'text')}) AS text) "
                f"FROM read_parquet('{p}')"
            )
        elif t == "orders":
            # o_orderpriority is the ORC round-trip's PARTITION column:
            # hostile values become directory names, the hardest
            # escaping path (Hive-style %-encoding on write, decode on
            # partition discovery)
            sel = (
                "SELECT * REPLACE ("
                f"(CASE {whens('o_orderkey', 'o_orderpriority')}) "
                "AS o_orderpriority) "
                f"FROM read_parquet('{p}')"
            )
        else:
            sel = f"SELECT * FROM read_parquet('{p}')"
        con.execute(f"COPY ({sel}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    n_bad = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/nation.parquet')"
        " WHERE n_name LIKE '%\n%' OR n_name LIKE '%\"%'"
    ).fetchone()[0]
    assert n_bad > 0, "no quoting edges injected"
    print(f"fixture: {n_bad} hostile nation names")
    con.close()


def direct_roundtrip_checks(spark, out: str) -> list[str]:
    """Staged-vs-original equality per format — catches corruption the
    aggregate entries cannot see."""
    import __spark_entry__ as entrymod

    from yelp_review_data_analysis_using_big_data_technologies_spark.sources.readers import load_table

    problems = []
    for fmt, stager, table in (
        ("csv", entrymod._staged_csv_nation, "nation"),
        ("json", entrymod._staged_json_documents, "documents"),
        ("orc", entrymod._staged_orc_orders, "orders"),
    ):
        orig = load_table(spark, out, table)
        staged = stager(spark, out).select(*orig.columns)
        diff = staged.exceptAll(orig).count() + orig.exceptAll(staged).count()
        if diff:
            problems.append(f"[direct:{fmt}] {diff} rows differ after round-trip")
        print(f"  direct:{fmt}: {'FAIL' if diff else 'ok'}", flush=True)
    return problems


if __name__ == "__main__":
    raise SystemExit(
        run_probe(
            "ingest_quote",
            build_fixture,
            ENTRIES,
            only=sys.argv[1:],
            extra_checks=direct_roundtrip_checks,
        )
    )

"""Malformed-JSON injection over the semi-structured twins (round 7).

Spark's `get_json_object` NULLs on malformed JSON, but two sibling
paths were job-abort hazards found by engine probing this round:
``parse_json`` (VARIANT) raises on the first malformed string under
ANSI, and an ANSI ``cast('int')`` of a non-numeric extracted value
aborts too.  Both entries now use the ``try_`` forms, and the DuckDB
oracles wrap extraction in ``TRY_CAST`` twice (to JSON, then to
INTEGER) — DuckDB's plain ``json_extract_string`` raises
``Invalid Input Error`` on malformed input where Spark quietly NULLs.

This suite injects the malformed shapes into ``events.props`` and
replays both twins through the driver-gate comparator.

Round 8 turned the formerly-documented coercion divergences into a
PINNED CONTRACT (VERDICT r7 ask #4), Spark's semantics per path:

- string path (``json_extract``): ``try_cast(string AS int)`` —
  integral text only (optional sign, surrounding whitespace); NULL on
  fractional ("5.5" → NULL, where DuckDB's bare TRY_CAST rounds to
  6), scientific, bool, and int32 overflow.  The twin regex-guards
  integral format before casting.
- VARIANT path (``json_variant_extract``): ``try_variant_get(...,
  'int')`` — JSON numbers truncate toward zero (5.5→5, -5.5→-5,
  1e2→100), booleans coerce (true→1, false→0), JSON strings cast
  strictly like the string path, overflow → NULL.  The twin
  dispatches on ``json_type``.

Every coercion class is now injected below, so the two paths'
deliberately-different semantics are exercised — not just documented
— on every run.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from yelp_review_data_analysis_using_big_data_technologies_spark.sources.readers import TABLES



_DIRTY_PROPS = [
    (0, "'not json'"),
    (1, "''"),
    (2, "'  '"),
    (3, "'{broken'"),
    (4, "e'{\"k\": \"abc\"}'"),
    (5, "e'{\"k\": 5'"),          # truncated object
    (6, "e'{\"other\": 1}'"),     # key absent
    (7, "e'{\"k\": null}'"),
    (8, "e'{\"k\": [1, 2]}'"),    # non-scalar k
    # --- coercion-contract classes (r8): paths diverge BY DESIGN ---
    (9, "e'{\"k\": 5.5}'"),       # str→NULL, variant→5 (trunc)
    (10, "e'{\"k\": -5.5}'"),     # str→NULL, variant→-5 (trunc to 0)
    (11, "e'{\"k\": true}'"),     # str→NULL, variant→1
    (12, "e'{\"k\": false}'"),    # str→NULL, variant→0
    (13, "e'{\"k\": 5.0}'"),      # str→NULL, variant→5
    (14, "e'{\"k\": 1e2}'"),      # str→NULL, variant→100
    (15, "e'{\"k\": \"5.5\"}'"),  # strings cast STRICTLY: NULL both
    (16, "e'{\"k\": \" 7 \"}'"),  # whitespace-trimmed: 7 both
    (17, "e'{\"k\": 2147483648}'"),  # int32 overflow: NULL both
    (18, "e'{\"k\": 1e20}'"),     # double overflow: NULL both
    # --- duplicate-key class (r9): the STRING path agrees (both
    # engines return the FIRST occurrence) but Spark's
    # try_parse_json REJECTS dup-key objects (NULL variant) while
    # DuckDB's JSON cast keeps them — the variant twin NULLs
    # top-level dup-key objects to match (json_keys guard)
    (19, "e'{\"k\": 3, \"k\": 9}'"),
    (20, "e'{\"k\": 4, \"other\": 1, \"other\": 2}'"),
    # --- structural classes (r9 second half) ---
    (21, "e'{\"k\": {\"a\": 1}}'"),   # non-scalar OBJECT k: NULL both
    # unicode-escaped KEY: both parsers must decode k to 'k'
    # BEFORE path matching — a raw-text matcher would miss it
    (22, "e'{\"\\\\u006b\": 8}'"),
    (23, "e'{\"k\": -1E+2}'"),        # signed-exponent sci notation
]

ENTRIES = ["json_extract", "json_variant_extract", "events_analytics_panel"]


@pytest.fixture(scope="module")
def dirty_dir(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("dirty_props_sf")
    con = duckdb.connect()
    whens = " ".join(
        f"WHEN hash(event_id) % 37 = {k} THEN {lit}" for k, lit in _DIRTY_PROPS
    )
    for t in TABLES:
        p = os.path.join(src, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        if t == "events":
            sel = (
                f"SELECT * REPLACE ((CASE {whens} ELSE props END) AS props) "
                f"FROM read_parquet('{p}')"
            )
        else:
            sel = f"SELECT * FROM read_parquet('{p}')"
        con.execute(f"COPY ({sel}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    n_bad = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/events.parquet') "
        "WHERE try_cast(props AS JSON) IS NULL AND props IS NOT NULL"
    ).fetchone()[0]
    assert n_bad > 0, "no malformed props injected"
    con.close()
    return str(out)


@pytest.fixture(scope="module")
def duck(dirty_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(dirty_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


@pytest.mark.parametrize("name", ENTRIES)
def test_twin_agrees_under_malformed_props(spark, dirty_dir, duck, name, check):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    problems = check.compare(
        name, spark, duck, dirty_dir, queries[name], oracles[name]
    )
    assert not problems, "\n".join(problems)

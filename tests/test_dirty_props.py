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

Documented residual divergences (shapes deliberately NOT injected,
pinned here as known-diverging): a numeric-string ``k`` ("5.5") —
DuckDB TRY_CAST routes through double and rounds (6) where Spark's
try_cast NULLs — and a bool ``k`` — variant_get coerces true→1.
The fixtures' generator only ever emits integer ``k``.
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

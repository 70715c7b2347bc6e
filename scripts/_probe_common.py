"""Shared driver for the injection probe scripts.

Each probe supplies a fixture builder (hostile parquet copy of the
testdata tables) and an entry list; this module owns the loop every
probe repeats — build, register DuckDB views, replay each twin
through the real gate comparator (scripts/check_oracle.py), print
per-entry status, exit 1 on any failure.  The pinned test suites in
tests/ are the permanent regression artifacts; probes stay as the
exploration tools that found the defects.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import tempfile
from collections.abc import Callable, Sequence

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import release_staging
from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark
from yelp_review_data_analysis_using_big_data_technologies_spark.sources.readers import TABLES

SRC = "/root/testdata/sf0.001"


def load_check_oracle():
    spec = importlib.util.spec_from_file_location(
        "check_oracle",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "check_oracle.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run_probe(
    name: str,
    build_fixture: Callable[[str], None],
    entries: Sequence[str],
    only: Sequence[str] = (),
    extra_checks: Callable[[object, str], list[str]] | None = None,
) -> int:
    """Build the fixture, replay ``entries`` (scoped by ``only``), run
    optional ``extra_checks(spark, fixture_dir)``, report, return exit
    code."""
    check = load_check_oracle()
    import __spark_entry__ as entrymod

    out = tempfile.mkdtemp(prefix=f"{name}_")
    build_fixture(out)
    spark = get_spark(f"probe_{name}")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(out, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only_set = set(only)
    failures: list[str] = []
    for qname in entries:
        if only_set and qname not in only_set:
            continue
        try:
            probs = check.compare(
                qname, spark, con, out, qs[qname], oracles.get(qname)
            )
        except Exception as exc:  # noqa: BLE001
            probs = [
                f"[{qname}] EXCEPTION: {type(exc).__name__}: {str(exc)[:300]}"
            ]
        finally:
            release_staging()
        print(f"  {qname}: {'FAIL' if probs else 'ok'}", flush=True)
        failures.extend(probs)
    if extra_checks is not None:
        failures.extend(extra_checks(spark, out))
    print()
    for f in failures:
        print(f)
    return 1 if failures else 0

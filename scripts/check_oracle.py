"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compares row counts,
column names/dtypes, and values (columns sorted by name, rows sorted,
floats compared with tolerance).  Usage::

    python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import release_staging
from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark
from yelp_review_data_analysis_using_big_data_technologies_spark.sources.readers import TABLES

import __spark_entry__ as entrymod


def _normalize(val):
    if val is None:
        return None
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return round(val, 6)
    return str(val)


def _rows_to_sorted(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_normalize(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t))


def _close(a, b) -> bool:
    if a is None or b is None:
        return a is b
    if a == "NaN" or b == "NaN":
        # _normalize maps NaN to the sentinel string; float("NaN")
        # would fall through to isclose(nan, nan) == False and turn an
        # agreed-NaN row into a false failure.
        return a == b
    try:
        fa, fb = float(a), float(b)
        return math.isclose(fa, fb, rel_tol=1e-6, abs_tol=1e-6)
    except (TypeError, ValueError):
        return a == b


def _kind(v):
    """Coarse value kind for dtype-drift detection: the driver's
    canonicalizer hashes dtypes, so an int-vs-float column (a missing
    CAST in one twin) must fail HERE, not only on the driver."""
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    return type(v).__name__


def compare(name: str, spark, con, sf_dir: str, qfn, sql: str | None) -> list[str]:
    problems: list[str] = []
    sdf = qfn(spark, sf_dir)
    scols = sdf.columns
    srows = sdf.collect()
    if sql is None:
        print(f"  {name}: rows-only ({len(srows)} rows)")
        return problems
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    if sorted(scols) != sorted(dcols):
        problems.append(f"[{name}] column mismatch spark={sorted(scols)} duck={sorted(dcols)}")
        return problems
    if len(srows) != len(drows):
        problems.append(f"[{name}] rowcount spark={len(srows)} duck={len(drows)}")
        return problems
    # numeric-kind drift: compare the first non-null value per column
    # by name (int-vs-float is the forgotten-CAST class the driver's
    # dtype hash catches; fail it locally too)
    s_kinds = {}
    for i, c in enumerate(scols):
        sv = next((r[i] for r in srows if r[i] is not None), None)
        if sv is not None:
            s_kinds[c] = _kind(sv)
    dorder = {c: j for j, c in enumerate(dcols)}
    for c in s_kinds:
        dv = next((r[dorder[c]] for r in drows if r[dorder[c]] is not None), None)
        if dv is not None:
            sk, dk = s_kinds[c], _kind(dv)
            if {sk, dk} == {"int", "float"}:
                problems.append(
                    f"[{name}] dtype drift on column {c}: spark={sk} duck={dk}"
                )
    if problems:
        return problems
    s_sorted = _rows_to_sorted([tuple(r) for r in srows], scols)
    d_sorted = _rows_to_sorted(drows, dcols)
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        if sr != dr and not all(_close(a, b) for a, b in zip(sr, dr)):
            problems.append(f"[{name}] first value diff at sorted row {i}:\n  spark={sr}\n  duck ={dr}")
            break
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # A misspelled name must be an ERROR, not zero checks reported as
    # "all passed" — past-window entries are verified ONLY through
    # this script, so a typo'd run silently skipping them is a false
    # green of exactly the class the gate exists to catch.
    unknown = only - qs.keys()
    if unknown:
        print(f"unknown query names: {sorted(unknown)}")
        return 2
    failures: list[str] = []
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        try:
            probs = compare(name, spark, con, sf_dir, fn, oracles.get(name))
        except Exception as exc:  # noqa: BLE001
            probs = [f"[{name}] EXCEPTION: {type(exc).__name__}: {exc}"]
        finally:
            release_staging()
        if probs:
            failures.extend(probs)
            print(f"  {name}: FAIL")
        elif oracles.get(name) is not None:
            # rows-only entries already printed their single status
            print(f"  {name}: ok")
    print()
    if failures:
        print("FAILURES:")
        for f in failures:
            print(f)
        return 1
    print(f"all checks passed ({checked} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

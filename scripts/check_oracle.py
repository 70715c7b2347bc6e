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
        r = round(val, 6)
        if r == 0.0:
            # preserve the zero's SIGN BIT through comparison: Python
            # == treats -0.0 == 0.0, but the driver's pandas hash does
            # not (r9 signed-zero class) — encode as distinct strings
            # so the row compare actually sees the byte difference.
            return "-0.0" if math.copysign(1.0, r) < 0 else "0.0"
        return r
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
        if fa == 0.0 and fb == 0.0:
            # signed zero is a REAL driver divergence: pandas hashes
            # -0.0 and +0.0 differently, Spark normalizes -0.0 to
            # +0.0 in round()/min()/least() while DuckDB preserves it
            # (r9 signed-zero class) — isclose(0.0, -0.0) would hide
            # exactly the byte difference the driver hashes.
            return math.copysign(1.0, fa) == math.copysign(1.0, fb)
        return math.isclose(fa, fb, rel_tol=1e-6, abs_tol=1e-6)
    except (TypeError, ValueError):
        return a == b


def _spark_pandas_kind(dtype_simple: str, has_null: bool) -> str:
    """Coarse pandas-dtype kind a Spark column takes on the driver's
    ``toPandas()`` path.  Integral columns carrying NULLs convert to
    float64 (pandas has no nullable int on this path) — the same
    conversion DuckDB's ``.df()`` applies, which is why NULL-induced
    floats agree across engines while a HUGEINT/DECIMAL twin drifts."""
    if dtype_simple in ("tinyint", "smallint", "int", "bigint"):
        return "float" if has_null else "int"
    if dtype_simple in ("float", "double"):
        return "float"
    if dtype_simple == "boolean":
        return "object" if has_null else "bool"
    if dtype_simple.startswith("decimal"):
        # toPandas yields object-dtype Decimal values; DuckDB's .df()
        # yields float64 — the sql_priority_share drift class.
        return "object"
    if dtype_simple in ("date", "timestamp", "timestamp_ntz"):
        return "datetime"
    return "object"


def _duck_pandas_kind(dtype) -> str:
    """Coarse kind of a DuckDB ``.df()`` column dtype — the exact
    frame the driver's canonicalizer hashes.  fetchall() hides
    HUGEINT→float64 and DECIMAL→float64 drift (both come back as
    Python int/Decimal); the .df() dtype is the ground truth."""
    import pandas.api.types as pt

    if pt.is_bool_dtype(dtype):
        return "bool"
    if pt.is_integer_dtype(dtype):
        return "int"
    if pt.is_float_dtype(dtype):
        return "float"
    if pt.is_datetime64_any_dtype(dtype):
        return "datetime"
    return "object"


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
    # dtype drift on the DRIVER'S view: the driver hashes pandas
    # frames (Spark .toPandas() vs DuckDB .df()), where DuckDB renders
    # HUGEINT (sum of BIGINT) and DECIMAL as float64 — invisible to
    # fetchall(), which hands back Python int/Decimal.  Re-execute the
    # SQL on the .df() path (cheap at sf0.01) and compare coarse kinds
    # against the kind Spark's toPandas would produce for each column
    # (derived from the schema plus the observed null pattern — values
    # already matched, so the null pattern is shared across engines).
    # Matching datetime kinds pass via sk == dk like every other kind;
    # MIXED pairs involving datetime (e.g. a Spark STRING date vs a
    # DuckDB DATE — str(date) makes the value compare a false green)
    # are exactly the driver-pandas-dtype drift this gate exists to
    # catch, so they FAIL.  (DuckDB .df() renders DATE and TIMESTAMP
    # as datetime64, never object-of-date, verified in this container.)
    ddtypes = con.execute(sql).df().dtypes
    schema_by_name = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    for i, c in enumerate(scols):
        has_null = any(r[i] is None for r in srows)
        sk = _spark_pandas_kind(schema_by_name[c], has_null)
        dk = _duck_pandas_kind(ddtypes[c])
        if sk != dk:
            problems.append(
                f"[{name}] pandas dtype drift on column {c}: "
                f"spark~{sk} ({schema_by_name[c]}"
                f"{', nulls' if has_null else ''}) duck={ddtypes[c]} (~{dk})"
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

"""Probe: extreme calendar dates through the date-part twins.

Round-8 injection class j.  Scraped/CDC data carries garbage dates —
year-1 placeholders, pre-Gregorian-reform days, sentinel 9999-12-31 —
and the divergence candidates stack up at the pandas hash layer and
the calendar layer both:

- the driver hashes pandas frames: Spark DATE → object dtype of
  ``datetime.date`` (no range limit), DuckDB DATE → ``datetime64``
  (ns range ends 2262-04-11; DuckDB emits µs so 9999 survives, but
  the REPRESENTATIONS differ and the gate's dtype guard must hold);
- ``year``/``month``/``dayname`` over the proleptic Gregorian
  calendar: 1582-10-05..14 never existed in the historical calendar —
  engines that implement the cutover (Spark 2.x legacy) disagree with
  proleptic engines on day-of-week for everything before 1582;
- year-1 boundary arithmetic (day-of-week cycles anchored at epoch).

The fixture hash-shifts slices of ``orders.o_orderdate`` to
0001-01-01, 1582-10-05 (inside the cutover gap), 2262-04-12 (one day
past the datetime64[ns] ceiling), and 9999-12-31, then replays every
twin whose oracle touches ``o_orderdate``.

Usage::

    python scripts/probe_extreme_dates.py [entry ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from _probe_common import SRC, TABLES, run_probe

#: (modulus-class, replacement DATE literal)
DIRTY = [
    (0, "DATE '0001-01-01'"),
    (1, "DATE '1582-10-05'"),   # inside the Gregorian cutover gap
    (2, "DATE '2262-04-12'"),   # one past the datetime64[ns] ceiling
    (3, "DATE '9999-12-31'"),   # the classic sentinel
]

#: Every twin whose oracle references o_orderdate.
ENTRIES = [
    "master_table",
    "na_drop",
    "dashboard_yearly_trend",
    "dashboard_day_of_week",
    "dashboard_most_active_day",
    "window_trend_panel",
    "dashboard_pivot_priority",
    "dashboard_tiles",
    "table_maintenance_roundtrip",
    "master_table_partitioned_roundtrip",
]


def build_fixture(out: str) -> None:
    con = duckdb.connect()
    whens = " ".join(
        f"WHEN hash(o_orderkey) % 19 = {k} THEN {lit}" for k, lit in DIRTY
    )
    for t in TABLES:
        p = os.path.join(SRC, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        if t == "orders":
            sel = (
                f"SELECT * REPLACE ((CASE {whens} ELSE o_orderdate END) "
                f"AS o_orderdate) FROM read_parquet('{p}')"
            )
        else:
            sel = f"SELECT * FROM read_parquet('{p}')"
        con.execute(f"COPY ({sel}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/orders.parquet') "
        "WHERE o_orderdate < DATE '1800-01-01' "
        "   OR o_orderdate > DATE '2200-01-01'"
    ).fetchone()[0]
    assert n > 0, "no extreme dates injected"
    print(f"fixture: {n} extreme-date rows")
    con.close()


if __name__ == "__main__":
    raise SystemExit(
        run_probe("extreme_dates", build_fixture, ENTRIES, only=sys.argv[1:])
    )

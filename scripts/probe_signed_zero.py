"""Probe: signed-zero divergence through rounded measure columns.

Round-9 injection class.  IEEE-754 has two zeros; Spark NORMALIZES
-0.0 to +0.0 in round()/min()/least() outputs while DuckDB PRESERVES
the sign bit (both verified in this container), and the driver's
pandas hash distinguishes the two byte patterns.  Every twin that
rounds a possibly-tiny-negative double to 6 dp is therefore one
corrupt row away from a red driver hash: round(-1e-9, 6) is +0.0 on
Spark and -0.0 on DuckDB.  Python's own ``==`` ALSO treats the zeros
as equal, so the local gate was blind to the class until
check_oracle's ``_normalize`` learned to encode the sign bit (r9).

This probe plants exact -0.0 and tiny-negative values (rounding to
zero at 2 and 6 dp) into ``events.value`` and replays the measure
twins under the hardened comparator.

Usage::

    python scripts/probe_signed_zero.py [entry ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from _probe_common import SRC, TABLES, run_probe

ENTRIES = [
    "events_stats_profile",
    "events_value_mad",
    "events_value_histogram",
    "events_time_decay_profile",
    "events_ohlc_bars",
    "events_anomaly_profile",
    "events_analytics_panel",
    "events_sessionize",
    "events_asof_join",
    "events_interpolate_join",
    "stream_windows_panel",
    "stream_ohlc_bars",
    "stream_tumbling_counts",
    "salted_join_segments",
    "cdc_latest_state",
    "dashboard_tiles",
]


def build_fixture(out: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SRC, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        if t == "events":
            sel = (
                "SELECT * REPLACE ((CASE "
                "WHEN hash(event_id) % 23 = 0 THEN -0.0 "
                "WHEN hash(event_id) % 23 = 1 THEN -1e-9 "
                "WHEN hash(event_id) % 23 = 2 THEN -4e-7 "
                "WHEN hash(event_id) % 23 = 3 THEN -4e-3 "
                "ELSE value END) AS value) "
                f"FROM read_parquet('{p}')"
            )
        else:
            sel = f"SELECT * FROM read_parquet('{p}')"
        con.execute(f"COPY ({sel}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/events.parquet') "
        "WHERE value <= 0 AND value > -1"
    ).fetchone()[0]
    assert n > 0, "no signed-zero/tiny-negative rows injected"
    print(f"fixture: {n} signed-zero/tiny-negative rows")
    con.close()


if __name__ == "__main__":
    raise SystemExit(
        run_probe("signed_zero", build_fixture, ENTRIES, only=sys.argv[1:])
    )

"""Probe: pre-1970 / negative-epoch / epoch-boundary event times.

Round-8 injection class (VERDICT r7 ask #2a).  The session runs UTC,
so true DST edges don't exist in session-time semantics — the class
that CAN diverge is negative-epoch arithmetic: integer division and
``floor`` disagree on negatives (trunc-toward-zero vs floor), and
window bucketing / epoch extraction / date parts all sit on top of
that arithmetic.  This probe hash-shifts a slice of ``events.ts``
into 1904/1969 (negative epoch), plants rows exactly AT the epoch
origin and 1 µs either side (bucket-boundary behavior), then replays
every event-time twin via the real gate comparator.

Usage::

    python scripts/probe_timestamp_edges.py [entry ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from _probe_common import SRC, TABLES, run_probe


#: every oracled entry that reads event time
ENTRIES = [
    "cdc_latest_state",
    "cdc_scd2_history",
    "stream_tumbling_counts",
    "stream_windows_panel",
    "stream_sliding_counts",
    "stream_static_enrich",
    "stream_stream_join",
    "stream_joins_panel",
    "stream_incremental_matview",
    "events_sessionize",
    "events_range_join_sessions",
    "events_asof_join",
    "events_interpolate_join",
    "events_funnel_steps",
    "events_transition_matrix",
    "events_cohort_retention",
    "events_hourly_gapfill",
    "events_analytics_panel",
    "events_heavy_hitters",
    "events_stats_profile",
]


def build_fixture(out: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SRC, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        if t == "events":
            # ~1/13 of rows → 1969 (small negative epoch, same month
            # structure), ~1/13 → 1904 (deep negative, leap-era), rest
            # untouched; then append 4 boundary rows at ±1 µs around
            # the epoch origin and exactly on an hour boundary.
            sel = (
                "SELECT * REPLACE ((CASE "
                "WHEN hash(event_id) % 13 = 0 THEN ts - INTERVAL 55 YEAR "
                "WHEN hash(event_id) % 13 = 1 THEN ts - INTERVAL 120 YEAR "
                "ELSE ts END) AS ts) "
                f"FROM read_parquet('{p}') "
                "UNION ALL "
                "SELECT 9000001, TIMESTAMP '1970-01-01 00:00:00', 1, "
                "'click', 1.0, NULL "
                "UNION ALL "
                "SELECT 9000002, TIMESTAMP '1970-01-01 00:00:00' - INTERVAL 1 MICROSECOND, "
                "1, 'click', 2.0, NULL "
                "UNION ALL "
                "SELECT 9000003, TIMESTAMP '1970-01-01 00:00:00' + INTERVAL 1 MICROSECOND, "
                "2, 'view', 3.0, NULL "
                "UNION ALL "
                "SELECT 9000004, TIMESTAMP '1969-12-31 23:00:00', 2, "
                "'view', 4.0, NULL"
            )
        else:
            sel = f"SELECT * FROM read_parquet('{p}')"
        con.execute(f"COPY ({sel}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    n_neg = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/events.parquet') "
        "WHERE ts < TIMESTAMP '1970-01-01'"
    ).fetchone()[0]
    assert n_neg > 0, "no pre-1970 timestamps injected"
    print(f"fixture: {n_neg} pre-1970 rows")
    con.close()


if __name__ == "__main__":
    import sys as _sys

    raise SystemExit(
        run_probe("ts_edges", build_fixture, ENTRIES, only=_sys.argv[1:])
    )

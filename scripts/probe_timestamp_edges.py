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

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import release_staging
from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark
from yelp_review_data_analysis_using_big_data_technologies_spark.sources.readers import TABLES

import __spark_entry__ as entrymod
import importlib.util

_spec = importlib.util.spec_from_file_location(
    "check_oracle",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "check_oracle.py"),
)
check = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check)

SRC = "/root/testdata/sf0.001"

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


def main() -> int:
    only = set(sys.argv[1:])
    out = tempfile.mkdtemp(prefix="ts_edges_")
    build_fixture(out)
    spark = get_spark("probe_ts_edges")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(out, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name in ENTRIES:
        if only and name not in only:
            continue
        try:
            probs = check.compare(name, spark, con, out, qs[name], oracles.get(name))
        except Exception as exc:  # noqa: BLE001
            probs = [f"[{name}] EXCEPTION: {type(exc).__name__}: {exc}"]
        finally:
            release_staging()
        print(f"  {name}: {'FAIL' if probs else 'ok'}")
        failures.extend(probs)
    print()
    for f in failures:
        print(f)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

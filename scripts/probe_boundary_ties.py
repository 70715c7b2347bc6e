"""Probe: boundary ties through the time-join/window family.

Round-9 injection class.  Every time operator has an inclusivity
contract somewhere: window buckets are [start, end), sessions merge
on a gap EXACTLY equal to the timeout (strictly-greater breaks), the
as-of join takes quotes at-or-before the event, range joins include
or exclude interval endpoints, and same-timestamp duplicates force
every argmin/argmax tie rule to actually fire.  The clean fixtures
land between boundaries, so none of those contracts has ever been
exercised cross-engine.  This probe snaps event times EXACTLY onto
hour/minute boundaries, manufactures user-adjacent pairs separated by
EXACTLY the 30-minute session gap, and appends same-timestamp
duplicate rows — then replays every event-time twin through the real
gate comparator.

Usage::

    python scripts/probe_boundary_ties.py [entry ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from _probe_common import SRC, TABLES, run_probe

#: every oracled entry that reads event time or breaks ts ties
ENTRIES = [
    "events_sessionize",
    "events_asof_join",
    "events_range_join_sessions",
    "events_interpolate_join",
    "events_hourly_gapfill",
    "events_ohlc_bars",
    "events_analytics_panel",
    "events_transition_matrix",
    "events_cohort_retention",
    "events_funnel_steps",
    "events_heavy_hitters",
    "events_stats_profile",
    "events_time_decay_profile",
    "events_anomaly_profile",
    "stream_windows_panel",
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_static_enrich",
    "stream_stream_join",
    "stream_joins_panel",
    "cdc_latest_state",
    "cdc_scd2_history",
    "dedup_keyed_deterministic",
]


def build_fixture(out: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SRC, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        if t == "events":
            # pass 1: snap ~1/7 of rows to exact hour boundaries and
            # ~1/11 to exact minute boundaries (bucket-edge rows, plus
            # plenty of duplicate timestamps); pass 2: for ~1/13 of
            # rows, rewrite ts to EXACTLY lag(ts) + 30 minutes within
            # the user's (re-snapped) timeline — the session-gap
            # boundary; pass 3: append same-timestamp duplicates of
            # ~1/17 of rows under fresh event_ids (ts ties with
            # different values/ids).
            sel = f"""
WITH snapped AS (
  SELECT * REPLACE ((CASE
    WHEN hash(event_id) % 7 = 0 THEN date_trunc('hour', ts)
    WHEN hash(event_id) % 11 = 0 THEN date_trunc('minute', ts)
    ELSE ts END) AS ts)
  FROM read_parquet('{p}')
), gapped AS (
  SELECT * EXCLUDE (lg) REPLACE ((CASE
    WHEN hash(event_id) % 13 = 0 AND lg IS NOT NULL
    THEN lg + INTERVAL 30 MINUTE
    ELSE ts END) AS ts)
  FROM (
    SELECT *, lag(ts) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS lg
    FROM snapped
  )
)
SELECT * FROM gapped
UNION ALL
SELECT event_id + 10000000, ts, user_id, event_type, value + 0.5, props
FROM gapped WHERE hash(event_id) % 17 = 0
"""
        else:
            sel = f"SELECT * FROM read_parquet('{p}')"
        con.execute(f"COPY ({sel}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    stats = con.execute(
        f"""
SELECT
  count(*) FILTER (ts = date_trunc('hour', ts)) AS on_hour,
  count(*) FILTER (ts = date_trunc('minute', ts)) AS on_minute,
  count(*) - count(DISTINCT (user_id, ts)) AS dup_user_ts
FROM read_parquet('{out}/events.parquet')
"""
    ).fetchone()
    gap_pairs = con.execute(
        f"""
SELECT count(*) FROM (
  SELECT ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS d
  FROM read_parquet('{out}/events.parquet')
) WHERE d = INTERVAL 30 MINUTE
"""
    ).fetchone()[0]
    assert stats[0] > 0 and stats[1] > 0 and stats[2] > 0 and gap_pairs > 0
    print(
        f"fixture: {stats[0]} on-hour, {stats[1]} on-minute, "
        f"{stats[2]} same-(user,ts) dups, {gap_pairs} exact-gap pairs"
    )
    con.close()


if __name__ == "__main__":
    raise SystemExit(
        run_probe("boundary_ties", build_fixture, ENTRIES, only=sys.argv[1:])
    )

"""Probe: catastrophic-cancellation magnitudes through the measure
aggregates.

Round-9 injection class.  Every double SUM in the repo is "exact to
6 dp" only while magnitudes stay sane: Spark adds partition partials
in shuffle order, DuckDB adds sequentially, and FP addition is not
associative — with ±1e14 spikes in the data the two orders can
differ in ABSOLUTE terms by far more than 1e-6, so sum/avg/stddev/
corr twins break even after rounding.  (An ulp at 1e14 is ~0.016;
a near-cancelling sum leaves that error sitting on a ~1.0 result.)
This probe plants paired +1e14 / −1e14 spikes (hash-keyed, so groups
nearly cancel) in ``events.value`` and replays the measure-aggregate
twins.

Usage::

    python scripts/probe_float_cancellation.py [entry ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from _probe_common import SRC, TABLES, run_probe

#: every oracled entry aggregating events.value
ENTRIES = [
    "events_stats_profile",
    "events_value_mad",
    "events_value_histogram",
    "events_analytics_panel",
    "events_time_decay_profile",
    "events_ohlc_bars",
    "events_anomaly_profile",
    "events_sessionize",
    "events_heavy_hitters",
    "stream_windows_panel",
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "salted_join_segments",
    "cdc_latest_state",
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
                "WHEN hash(event_id) % 19 = 0 THEN value + 1e14 "
                "WHEN hash(event_id) % 19 = 1 THEN value - 1e14 "
                "ELSE value END) AS value) "
                f"FROM read_parquet('{p}')"
            )
        else:
            sel = f"SELECT * FROM read_parquet('{p}')"
        con.execute(f"COPY ({sel}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    n_spike = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/events.parquet') "
        "WHERE abs(value) > 1e13"
    ).fetchone()[0]
    assert n_spike > 0, "no magnitude spikes injected"
    print(f"fixture: {n_spike} ±1e14 spike rows")
    con.close()


if __name__ == "__main__":
    raise SystemExit(
        run_probe(
            "float_cancel", build_fixture, ENTRIES, only=sys.argv[1:]
        )
    )

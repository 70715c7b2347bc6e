"""Probe: overlapping / out-of-order CDC batch replays.

Round-8 extra injection class (the idea-bank item "overlapping CDC
batch replays").  An at-least-once CDC source replays rows and
delivers batches out of order, so a later batch can carry a STALE
version of a key the table already updated.  The unversioned
replace-merge regresses the key by contract (last-delivered-wins,
pinned in tests/test_cdc_replay.py); the version-guarded sink
(``stream_merge_to_parquet(version_col=...)``) must converge to the
per-key latest-version state under ANY schedule.

Two attack surfaces:

1. Fixture hostility — duplicate (user_id, ts) version ties with
   divergent payloads, NULL version timestamps, duplicate event_ids —
   replayed through the gate for the CDC entries (does the entry's
   tie-collapse contract hold on dirty logs?).
2. Schedule hostility (``extra_checks``) — the SAME clean log delivered
   under several adversarial wave schedules (newest-first, shuffled
   thirds with replays, single snapshot batch, every-batch-replayed)
   must all converge to the one DuckDB latest-state oracle.

Usage::

    python scripts/probe_cdc_replay.py [entry ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from _probe_common import SRC, TABLES, run_probe

ENTRIES = [
    "cdc_out_of_order_merge",
    "cdc_latest_state",
    "cdc_scd2_history",
    "stream_incremental_matview",
]


def build_fixture(out: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SRC, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        if t == "events":
            # version ties: same (user_id, ts), different event_id /
            # payload; NULL version timestamps; duplicate event_ids.
            sel = (
                f"SELECT * FROM read_parquet('{p}') "
                "UNION ALL "
                "SELECT event_id + 1000000, ts, user_id, event_type, "
                "value + 0.25, props "
                f"FROM read_parquet('{p}') WHERE hash(event_id) % 17 = 0 "
                "UNION ALL "
                "SELECT event_id, ts, user_id, 'replayed', value, props "
                f"FROM read_parquet('{p}') WHERE hash(event_id) % 23 = 0 "
                "UNION ALL "
                "SELECT NULL, NULL, 3, 'null_ts', 2.5, NULL "
                "UNION ALL "
                "SELECT 999000001, NULL, 4, 'null_ts', 1.5, NULL"
            )
        else:
            sel = f"SELECT * FROM read_parquet('{p}')"
        con.execute(f"COPY ({sel}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    n_tie = con.execute(
        "SELECT count(*) FROM (SELECT user_id, ts FROM "
        f"read_parquet('{out}/events.parquet') "
        "GROUP BY 1, 2 HAVING count(*) > 1)"
    ).fetchone()[0]
    assert n_tie > 0, "no (user_id, ts) version ties injected"
    print(f"fixture: events has {n_tie} (user_id, ts) version-tie keys")
    con.close()


#: Wave schedules as lists of predicates over the per-user
#: newest-first rank rn (1 = newest).  Each inner list is one
#: micro-batch; overlaps are deliberate.
def _schedules(F):
    rn = F.col("__rn")
    m3 = F.pmod(rn, F.lit(3))
    return {
        "newest_first_with_replays": [
            m3 == 1,
            (m3 == 2) | (rn == 1),
            (m3 == 0) | (rn <= 2),
        ],
        "oldest_first": [m3 == 0, m3 == 2, (m3 == 1) | (rn <= 3)],
        "single_snapshot": [rn >= 1],
        "everything_twice": [rn >= 1, rn >= 1],
        "five_waves_shuffled": [
            m3 == 2,
            rn == 1,
            (m3 == 0) | (rn == 1),
            m3 == 1,
            rn <= 4,
        ],
    }


def extra_checks(spark, out: str) -> list[str]:
    import glob
    import shutil
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.joins import (
        stream_merge_to_parquet,
    )

    ev = spark.read.parquet(os.path.join(out, "events.parquet")).select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    tie = Window.partitionBy("user_id", "ts").orderBy(
        F.col("event_id").desc_nulls_last(),
        F.col("event_type").desc_nulls_last(),
        F.col("value").desc_nulls_last(),
    )
    uniq = (
        ev.withColumn("__tie", F.row_number().over(tie))
        .filter(F.col("__tie") == 1)
        .drop("__tie")
    )
    rank = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc_nulls_last(), F.col("event_id").desc_nulls_last()
    )
    ranked = uniq.withColumn("__rn", F.row_number().over(rank))

    con = duckdb.connect()
    want = con.execute(
        "WITH uniq AS (SELECT event_id, user_id, ts, event_type, value "
        "FROM (SELECT event_id, user_id, ts, event_type, value, "
        "row_number() OVER (PARTITION BY user_id, ts ORDER BY "
        "event_id DESC NULLS LAST, event_type DESC NULLS LAST, "
        "value DESC NULLS LAST) AS tie FROM "
        f"read_parquet('{out}/events.parquet')) WHERE tie = 1) "
        "SELECT user_id, event_id, epoch_us(ts), event_type, value "
        "FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY "
        "ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn FROM uniq) "
        "WHERE rn = 1 ORDER BY user_id"
    ).fetchall()
    con.close()
    want = {r[0]: r[1:] for r in want}

    failures: list[str] = []
    for name, preds in _schedules(F).items():
        base = tempfile.mkdtemp(prefix=f"cdc_sched_{name}_")
        src = os.path.join(base, "src")
        os.makedirs(src)
        for k, pred in enumerate(preds):
            stage = os.path.join(base, f"stage{k}")
            ranked.filter(pred).drop("__rn").coalesce(1).write.mode(
                "overwrite"
            ).parquet(stage)
            dst = os.path.join(src, f"wave{k}.parquet")
            shutil.move(
                glob.glob(os.path.join(stage, "part-*.parquet"))[0], dst
            )
            os.utime(dst, (1_000_000_000 + 1000 * k,) * 2)
        stream = (
            spark.readStream.schema(uniq.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        table = os.path.join(base, "table")
        stream_merge_to_parquet(
            stream,
            table,
            os.path.join(base, "ckpt"),
            keys=["user_id"],
            partition_by=["event_type"],
            version_col="ts",
        )
        got = {
            r["user_id"]: (
                r["event_id"],
                r["ts_us"],
                r["event_type"],
                r["value"],
            )
            for r in spark.read.parquet(table)
            .select(
                "user_id",
                "event_id",
                F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
                F.col("event_type").cast("string").alias("event_type"),
                "value",
            )
            .collect()
        }
        ok = got == want
        print(f"  schedule {name}: {'ok' if ok else 'FAIL'}", flush=True)
        if not ok:
            extra = {k: v for k, v in got.items() if want.get(k) != v}
            failures.append(
                f"[schedule:{name}] diverged on {len(extra)} keys; "
                f"sample: {dict(list(extra.items())[:3])}"
            )
        shutil.rmtree(base, ignore_errors=True)
    return failures


if __name__ == "__main__":
    raise SystemExit(
        run_probe(
            "cdc_replay",
            build_fixture,
            ENTRIES,
            only=sys.argv[1:],
            extra_checks=extra_checks,
        )
    )

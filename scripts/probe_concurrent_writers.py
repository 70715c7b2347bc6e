"""Probe: concurrent-writer partition clobbers (r8 idea-bank class).

Without a transactional table format, "can two jobs publish into one
parquet table at once?" depends entirely on HOW they write.  This
probe measures the four regimes on the engine's own writers:

1. in-session concurrent DISJOINT dynamic partition overwrites —
   SAFE: dynamic mode stages under a per-job ``.spark-staging-<uuid>``
   directory, so the writers never share scratch space and each
   commits only its own partitions.  This is the supported pattern
   for concurrent publishers (one partition subtree per writer).
2. in-session concurrent OVERLAPPING dynamic overwrites —
   last-committer-wins PER PARTITION; the loser's write is replaced
   whole (a partition never holds a mix of both writers' files in the
   observed trials, but nothing coordinates the outcome — overlap is
   a coordination bug, not a supported pattern).
3. cross-APPLICATION disjoint dynamic overwrites — same as (1); the
   staging UUID is per job, not per session.
4. cross-application concurrent APPEND to one root — UNSAFE by
   construction: both FileOutputCommitter jobs stage under the SAME
   ``<root>/_temporary/0`` directory, and the first commit deletes
   the other writer's staged files.  Observed: one writer dies with a
   missing-staging error (and in other interleavings can "succeed"
   silently with lost rows).  The contract (writers.py docstrings,
   pinned in tests/test_concurrent_writers.py): concurrent publishers
   use dynamic partition overwrite over disjoint partitions — never
   append to a shared root.

Merge sinks (``upsert_by_key``, the foreachBatch streams) are
read-modify-write and therefore SINGLE-WRITER per table by contract;
the streaming checkpoint serializes their batches.

Usage::

    python scripts/probe_concurrent_writers.py [trials]
"""

import os
import subprocess
import sys
import tempfile
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark
from yelp_review_data_analysis_using_big_data_technologies_spark.sources.writers import (
    overwrite_partitions_dynamic,
)

_CHILD = r"""
import sys
sys.path.insert(0, {repo!r})
from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark
from yelp_review_data_analysis_using_big_data_technologies_spark.sources.writers import overwrite_partitions_dynamic
tag, mode, off, root = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
spark = get_spark("cw_" + tag)
spark.sparkContext.setLogLevel("ERROR")
df = spark.range(100).selectExpr(
    "id", "CAST(id % 2 * 2 + " + str(off) + " AS INT) AS p", "'" + tag + "' AS src"
)
if mode == "dynamic":
    overwrite_partitions_dynamic(df, root, ["p"])
else:
    df.repartition(8).write.mode("append").parquet(root)
"""


def _partition_state(root: str):
    con = duckdb.connect()
    try:
        return con.execute(
            "SELECT p, src, count(*) FROM read_parquet("
            f"'{root}/p=*/*.parquet', hive_partitioning=1) "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ).fetchall()
    finally:
        con.close()


def in_session(spark, overlap: bool):
    root = tempfile.mkdtemp(prefix="cw_insess_") + "/table"
    spark.range(10).selectExpr(
        "id", "CAST(id % 4 AS INT) AS p", "'seed' AS src"
    ).write.partitionBy("p").parquet(root)
    errs = []

    def writer(tag, off):
        try:
            df = spark.range(100).selectExpr(
                "id", f"CAST(id % 2 * 2 + {off} AS INT) AS p", f"'{tag}' AS src"
            )
            overwrite_partitions_dynamic(df, root, ["p"])
        except Exception as exc:  # noqa: BLE001
            errs.append((tag, repr(exc)[:160]))

    ts = [
        threading.Thread(target=writer, args=("w1", 0)),
        threading.Thread(target=writer, args=("w2", 0 if overlap else 1)),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return errs, _partition_state(root)


def cross_app(mode: str):
    root = tempfile.mkdtemp(prefix=f"cw_xapp_{mode}_") + "/table"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _CHILD.format(repo=repo)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, tag, mode, str(off), root],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        for tag, off in (("w1", 0), ("w2", 1))
    ]
    rcs = [p.wait() for p in procs]
    if mode == "dynamic":
        return rcs, _partition_state(root)
    con = duckdb.connect()
    try:
        rows = con.execute(
            f"SELECT src, count(*) FROM read_parquet('{root}/*.parquet') "
            "GROUP BY 1 ORDER BY 1"
        ).fetchall()
    except Exception as exc:  # noqa: BLE001
        rows = f"READ FAILED: {str(exc)[:120]}"
    finally:
        con.close()
    return rcs, rows


def main() -> int:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("probe_concurrent_writers")
    spark.sparkContext.setLogLevel("ERROR")
    failures = []

    for i in range(trials):
        errs, state = in_session(spark, overlap=False)
        by_part = {p: (src, n) for p, src, n in state}
        ok = not errs and by_part == {
            0: ("w1", 50),
            1: ("w2", 50),
            2: ("w1", 50),
            3: ("w2", 50),
        }
        print(f"  in-session disjoint #{i}: {'ok' if ok else 'FAIL'} {state}")
        if not ok:
            failures.append(f"disjoint#{i}: errs={errs} state={state}")

    for i in range(trials):
        errs, state = in_session(spark, overlap=True)
        # overlap contract: per overlapping partition, EXACTLY ONE
        # writer's complete 50-row set survives — never a mix.
        per_part = {}
        for p, src, n in state:
            per_part.setdefault(p, []).append((src, n))
        ok = not errs and all(
            len(v) == 1 and v[0][0] in ("w1", "w2") and v[0][1] == 50
            for p, v in per_part.items()
            if p in (0, 2)
        )
        print(f"  in-session overlap  #{i}: {'ok' if ok else 'FAIL'} {state}")
        if not ok:
            failures.append(f"overlap#{i}: errs={errs} state={state}")

    rcs, state = cross_app("dynamic")
    by_part = {p: (src, n) for p, src, n in state}
    ok = rcs == [0, 0] and by_part == {
        0: ("w1", 50),
        1: ("w2", 50),
        2: ("w1", 50),
        3: ("w2", 50),
    }
    print(f"  cross-app disjoint dynamic: {'ok' if ok else 'FAIL'} {state}")
    if not ok:
        failures.append(f"cross-app dynamic: rcs={rcs} state={state}")

    rcs, rows = cross_app("append")
    both_complete = (
        isinstance(rows, list)
        and sorted(rows) == [("w1", 100), ("w2", 100)]
        and rcs == [0, 0]
    )
    # the HAZARD is the point: a clean both-complete outcome would
    # mean the committer collision stopped existing (and the contract
    # could be relaxed); anything else confirms the unsafe regime.
    print(
        "  cross-app append: "
        + ("HAZARD CONFIRMED" if not both_complete else "unexpectedly clean")
        + f" rcs={rcs} rows={rows}"
    )

    print()
    for f in failures:
        print(f)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

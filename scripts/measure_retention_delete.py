"""One-off measurement: what partition-pruned ``delete_where`` costs
relative to the naive full-table rewrite (backs ``sources/writers.py::
delete_where`` and the ``orders_retention_delete`` entry).

Stages the sf orders table partitioned by ``o_year`` (7 directories at
every SF) and times four delete shapes on fresh copies:

1. ``full_rewrite``   — the naive baseline: read all, filter, static
                        overwrite (what a pipeline without targeted
                        deletes runs for ANY erasure request)
2. ``single_key``     — erase ONE customer (the right-to-be-forgotten
                        unit of work): probe + rewrite of only the
                        partitions holding that key's rows
3. ``keyspace_slice`` — erase o_custkey % 13 = 0 (~7.7% of rows,
                        present in every partition — the worst case
                        for pruning: all partitions rewrite, but each
                        writes only survivors)
4. ``ttl``            — o_year < 1997: partition-only predicate, every
                        touched partition empties, so the delete is
                        directory removals with no row rewrite

Wall time at local[32]/sf0.1 undersells the 100-TB story (bytes here
are in page cache); the honest headline is the TOUCHED-PARTITION count
and the bytes-rewritten proxy (post-delete file bytes in touched dirs),
both of which scale with the erasure, not the table.

Usage::

    python scripts/measure_retention_delete.py [sf_dir]

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark
from yelp_review_data_analysis_using_big_data_technologies_spark.sources.readers import load_table
from yelp_review_data_analysis_using_big_data_technologies_spark.sources.writers import (
    delete_where,
    write_parquet,
)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("measure-retention")
    seed = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.year("o_orderdate").cast("int").alias("o_year"),
    )
    base = os.path.join(tempfile.gettempdir(), "measure_retention")
    shutil.rmtree(base, ignore_errors=True)
    # one target customer that exists (smallest custkey)
    one_key = seed.agg(F.min("o_custkey")).collect()[0][0]

    shapes = {
        "full_rewrite": None,
        "single_key": f"o_custkey = {one_key}",
        "keyspace_slice": "o_custkey % 13 = 0",
        "ttl": "o_year < 1997",
    }
    out: dict[str, dict] = {}
    for name, pred in shapes.items():
        root = os.path.join(base, name)
        write_parquet(seed.repartition("o_year"), root, partition_by=["o_year"])
        bytes_before = _dir_bytes(root)
        n_parts_before = sum(
            1 for d in os.listdir(root) if d.startswith("o_year=")
        )
        t0 = time.perf_counter()
        if pred is None:
            kept = (
                spark.read.parquet(root)
                .filter("NOT (o_custkey % 13 = 0)")
                .localCheckpoint(eager=True)
            )
            write_parquet(
                kept.repartition("o_year"), root, partition_by=["o_year"]
            )
            touched = n_parts_before
        else:
            touched = delete_where(spark, root, pred, ["o_year"])
        wall = round(time.perf_counter() - t0, 3)
        out[name] = {
            "wall_sec": wall,
            "partitions_touched": touched,
            "partitions_total": n_parts_before,
            "bytes_before": bytes_before,
            "bytes_after": _dir_bytes(root),
            "rows_after": spark.read.parquet(root).count(),
        }
    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"sf_dir": sf_dir, "shapes": out}))


if __name__ == "__main__":
    main()

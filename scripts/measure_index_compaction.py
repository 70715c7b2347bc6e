"""One-off measurement: what small-file accretion costs a persisted
IVF index probe, and what ``compact_ivf_index`` buys back (backs
``llm/vectors.py::compact_ivf_index`` and ``vec_ivf_index_compacted``).

Builds the index from a bootstrap slice, then applies ``n_merges``
small delta merges (the streaming-ingest shape — each merge rewrites
its touched cells with the write's task parallelism, so cells accrete
files), measures the per-cell file count and the median search wall
time, compacts, and measures both again.  Search results are asserted
identical before/after (the lossless contract the driver twin pins).

Wall time at local[32]/small data undersells the win: every extra file
costs a task launch + parquet footer read on EVERY probe that touches
its cell, and at 100-TB ingest rates a cell accretes files per
micro-batch forever — the honest headline is the file-count collapse
(the per-probe fixed-cost multiplier), with wall time as supporting
evidence.

Usage::

    python scripts/measure_index_compaction.py [sf_dir] [n_merges] [runs]

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.llm import vectors as lvec
from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark
from yelp_review_data_analysis_using_big_data_technologies_spark.sources.readers import load_table


def _files_per_cell(cells_dir: str) -> dict[str, int]:
    return {
        d: sum(
            1
            for f in os.listdir(os.path.join(cells_dir, d))
            if f.endswith(".parquet")
        )
        for d in os.listdir(cells_dir)
        if d.startswith("cell_id=")
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark("measure-compaction")
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(lvec.finite_vec("embedding"))
        .select("vec_id", "embedding")
    )
    n = emb.count()
    path = os.path.join(tempfile.gettempdir(), "measure_ivf_compaction")
    shutil.rmtree(path, ignore_errors=True)

    boot = max(64, n // (n_merges + 1))
    lvec.build_ivf_index(emb.filter(F.col("vec_id") < boot), path, n_cells=8)
    step = max(1, (n - boot) // n_merges)
    for i in range(n_merges):
        lo = boot + i * step
        hi = n if i == n_merges - 1 else boot + (i + 1) * step
        lvec.add_to_ivf_index(
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)), path
        )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )

    def _search():
        return sorted(
            tuple(r)
            for r in lvec.search_ivf_index(
                spark, path, queries, k=5, n_probe=2
            ).collect()
        )

    def _median_wall():
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            _search()
            samples.append(time.perf_counter() - t0)
        return round(statistics.median(samples), 3), [
            round(s, 3) for s in samples
        ]

    files_before = _files_per_cell(f"{path}/cells")
    result_before = _search()  # warm the scan path once
    wall_before, samples_before = _median_wall()
    t0 = time.perf_counter()
    lvec.compact_ivf_index(spark, path)
    compact_wall = round(time.perf_counter() - t0, 3)
    files_after = _files_per_cell(f"{path}/cells")
    result_after = _search()
    assert result_after == result_before, "compaction changed results"
    wall_after, samples_after = _median_wall()
    shutil.rmtree(path, ignore_errors=True)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_vectors": n,
                "n_merges": n_merges,
                "files_total_before": sum(files_before.values()),
                "files_total_after": sum(files_after.values()),
                "max_files_per_cell_before": max(files_before.values()),
                "search_wall_before": wall_before,
                "search_wall_after": wall_after,
                "samples_before": samples_before,
                "samples_after": samples_after,
                "compact_wall": compact_wall,
                "results_identical": True,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Staging-cache registry for the LLM-pipeline operators.

The LSH/Jaccard operators persist a small staging relation (tokenized
shingles / postings / band keys) because their plans reference it
several times — without the cache the tokenizer re-runs once per
reference (measured 4-7× at sf0.1).  ``persist()`` alone leaks: the
cached blocks outlive the query, and repeated invocations in one
session (the driver's multi-query correctness run, bench loops)
accumulate executor memory until eviction pressure.

This module is the explicit release hook: operators route their
``persist()`` through :func:`stage`, and callers that run many queries
in one session call :func:`release_staging` after each result is
materialized.  ``scripts/check_oracle.py`` and ``bench.py`` do this
per query; ``tests/test_llm.py`` asserts the catalog is clean after
release.  At warehouse scale the equivalent is a staging TABLE with an
explicit lifecycle, never an implicitly-leaked cache.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_STAGED: list[DataFrame] = []


def stage(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for later release."""
    staged = df.persist()
    _STAGED.append(staged)
    return staged


def spread(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Give a CPU-heavy narrow stage at least cluster-wide parallelism.

    A small parquet table (one row group) scans as ONE input split, so
    every expensive per-row projection above it — shingling, MinHash
    signatures, unrolled dot products — serializes onto a single core
    while the other 31 idle (measured: the whole banded-LSH staging ran
    as one 5.8 s task at sf0.1).  ``repartition(n)`` alone does NOT fix
    it: filter pushdown drags the computing projection below the new
    exchange, back onto the single-partition side.  Persisting the
    repartitioned NARROW projection is the optimizer barrier that keeps
    the heavy compute above the 32-way split (project down to the
    columns you need BEFORE calling this — the cache holds raw rows).

    Scale shape: when the input already has ≥ cluster parallelism
    (any real warehouse table), this is a NO-OP — no shuffle, no cache.
    The explicit partition count matters: AQE's size-based coalescing
    would immediately re-fuse a byte-tiny-but-CPU-heavy stage back to
    one task, but user-specified repartition counts are exempt."""
    sc = df.sparkSession.sparkContext
    target = min_parallelism or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return stage(df.repartition(target))


def release_staging(blocking: bool = True) -> int:
    """Unpersist every staged relation registered since the last
    release.  Call AFTER the query result has been materialized —
    releasing earlier just disables the cache the plan was built
    around.  Returns the number of relations released.

    Blocking by default: async unpersist hands the block-removal work
    to the next query's execution window, which serially poisons
    multi-query runs (bench measured 3-4× inflation on the queries
    following a heavy cached one)."""
    n = len(_STAGED)
    for df in _STAGED:
        df.unpersist(blocking=blocking)
    _STAGED.clear()
    return n

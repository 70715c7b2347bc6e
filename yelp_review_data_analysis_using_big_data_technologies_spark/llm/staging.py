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

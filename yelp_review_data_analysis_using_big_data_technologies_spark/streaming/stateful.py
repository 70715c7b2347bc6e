"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.10 — the (b)-tier escape hatch for semantics the
built-in windowed aggregations can't express).

The example operator is a per-user running profile: cumulative event
count, running value sum, and the timestamp of the last seen event,
emitted once per micro-batch per active user.  State lives in the
streaming state store partitioned by the grouping key — exactly the
layout a 1000-executor cluster shards — and a processing-time timeout
evicts idle users so state stays bounded.

The handler receives Arrow-batched pandas frames (all rows of one key
in one micro-batch), not single rows: per-batch Python overhead, the
same batching contract as ``mapInPandas``.

Idle-state eviction is OPT-IN (``idle_timeout_ms``): with
``ProcessingTimeTimeout`` enabled Spark keeps scheduling no-data
micro-batches to fire pending timers, so an ``availableNow``
(run-to-completion) execution never terminates — measured: ~100
empty batches in 90 s after the data batch finished.  Leave the
timeout off for batch-replay/backfill runs; turn it on for
continuous streams where bounded state matters more than a finite
run.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

#: Output row per (user, micro-batch).
RUNNING_PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

#: State tuple carried between micro-batches.
RUNNING_PROFILE_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _fold_profile(
    carry: tuple[int, float, int], batches: Iterator[pd.DataFrame]
) -> tuple[int, float, int]:
    """THE accumulation rule, shared verbatim by both state APIs (the
    module promises identical semantics for the applyInPandasWithState
    and transformWithStateInPandas variants — one fold keeps a fix in
    either handler from silently diverging the other)."""
    n, s, last_us = carry
    for pdf in batches:
        n += len(pdf)
        # NULL-aware like the batch twin: F.sum/F.max over an all-NULL
        # group are NULL, so the fold must distinguish "no non-null
        # seen" (None) from 0.0 / the epoch — pandas' nan-skipping
        # .sum() returns 0.0 and an all-NaT .max() is the int64-min
        # sentinel, both of which would leak fake values into the
        # profile.
        vals = pdf["value"].dropna()
        if len(vals):
            s = (0.0 if s is None else s) + float(vals.sum())
        ts = pdf["ts"].dropna()
        if len(ts):
            us = int(ts.max().value // 1_000)
            last_us = us if last_us is None else max(last_us, us)
    return n, s, last_us


def _emit_profile(key: tuple, n: int, s: float, last_us: int) -> pd.DataFrame:
    """The shared per-key output row (microsecond state → naive-UTC
    timestamp)."""
    import datetime as _dt

    return pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [None if s is None else round(s, 2)],
            "last_ts": [
                None
                if last_us is None
                else _dt.datetime.fromtimestamp(
                    last_us / 1_000_000, tz=_dt.timezone.utc
                ).replace(tzinfo=None)
            ],
        }
    )


def _make_update_profile(idle_timeout_ms: int | None):
    """Build the state-update handler; closing over the timeout keeps
    the handler itself pickle-able for the Python workers."""

    def _update_profile(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        carry = state.get if state.exists else (0, None, None)
        n, s, last_us = _fold_profile(carry, batches)
        state.update((n, None if s is None else round(s, 6), last_us))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield _emit_profile(key, n, s, last_us)

    return _update_profile


def running_user_profile(
    events: DataFrame,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Apply the stateful per-user profile over a STREAMING events
    frame (``user_id, ts: timestamp, value: double``).

    ``idle_timeout_ms=None`` (default) uses ``NoTimeout`` so
    run-to-completion (``availableNow``) executions terminate; pass a
    duration (e.g. ``3_600_000``) on continuous streams to evict
    users idle longer than that and bound state-store size.
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_profile(idle_timeout_ms),
        outputStructType=RUNNING_PROFILE_SCHEMA,
        stateStructType=RUNNING_PROFILE_STATE,
        outputMode="update",
        timeoutConf=timeout,
    )


def running_user_profile_tws(events: DataFrame) -> DataFrame:
    """The SAME per-user running profile on Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState``: a ``StatefulProcessor`` object holds
    NAMED, schema'd state handles (here one ``ValueState``) instead of
    a single opaque tuple, and the state store is RocksDB-backed
    (``transformWithState`` requires the RocksDB provider; the
    session conf is set here and applies to queries started after).

    Keeping both variants is deliberate: the old API is what's
    deployed on Spark 3.x clusters; this is the forward path — same
    semantics, verified by the same batch-equality unit test.

    Requires ``protobuf`` (transformWithState serializes state calls
    through it); absent, this raises ImportError at build time — the
    applyInPandasWithState twin above has no such dependency.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "transformWithStateInPandas requires the protobuf package; "
            "use running_user_profile (applyInPandasWithState) instead"
        ) from exc
    spark = events.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningProfile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "profile", RUNNING_PROFILE_STATE
            )

        def handleInputRows(
            self, key: tuple, rows: Iterator[pd.DataFrame], timer_values
        ) -> Iterator[pd.DataFrame]:
            carry = (
                self._state.get() if self._state.exists() else (0, None, None)
            )
            n, s, last_us = _fold_profile(carry, rows)
            self._state.update((n, None if s is None else round(s, 6), last_us))
            yield _emit_profile(key, n, s, last_us)

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningProfile(),
        outputStructType=RUNNING_PROFILE_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )

"""Relational core (SURVEY.md §2.2–2.6, §2.11).

Thin, scale-aware wrappers over the DataFrame API.  Everything here
compiles to a declarative Catalyst plan — column pruning, predicate
pushdown and join selection are the optimizer's job; these helpers
only add the hints the optimizer can't infer (broadcast for known-small
dims, key-scoped dedup instead of full-row shuffles).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rename_columns(df: DataFrame, renames: Mapping[str, str]) -> DataFrame:
    """P1 — bulk rename (reference scripts/etl.py:35-42 does it one
    ``withColumnRenamed`` per column; ``withColumnsRenamed`` is a single
    projection node)."""
    return df.withColumnsRenamed(dict(renames))


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """J1/J2 — USING-style equi-join (reference scripts/etl.py:46-48).

    ``broadcast_right=True`` hints a map-side join for dimension
    tables: at 100 TB the fact side never shuffles for a dim that fits
    in executor memory.  AQE will also convert sort-merge→broadcast at
    runtime when post-filter stats allow.
    """
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=list(on) if not isinstance(on, str) else on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """EXISTS — rows of ``left`` with a match; never duplicates left rows."""
    return equi_join(left, right, on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """NOT EXISTS — the referential-integrity audit the reference lacks
    (its inner joins silently drop orphans, scripts/etl.py:46-48)."""
    return equi_join(left, right, on, how="left_anti")


def dedup(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """F3 — ``dropDuplicates`` (reference scripts/etl.py:56 does the
    full-row form, which shuffles every column).  Prefer ``subset`` on
    the logical key at scale: the shuffle carries only key hashes and
    one surviving row per key."""
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def dedup_keyed_deterministic(
    df: DataFrame, keys: Sequence[str], tiebreak: Sequence[str] | None = None
) -> DataFrame:
    """Key-scoped dedup with a *deterministic* survivor.

    ``dropDuplicates(keys)`` keeps an arbitrary row per key — fine for
    idempotent pipelines, unverifiable for oracle comparison and
    re-runs.  This keeps the lexicographically-minimal row per key
    under a total order on ``tiebreak`` (default: all non-key columns),
    i.e. SQL ``row_number() over (partition by keys order by ... NULLS
    FIRST) = 1``.

    Implemented as ONE aggregation — ``min(struct(tiebreak...))`` with
    partial (map-side) combine — not a window.  The struct-typed
    buffer makes Spark pick SortAggregate (sort on the grouping key
    only), but partial aggregation still collapses each map partition
    to one row per key before the shuffle; the window formulation
    shuffles EVERY row and sorts on key+tiebreak (measured ~2× slower
    at sf0.1, and strictly more shuffled bytes at any scale).  Struct
    comparison is field-by-field in ``tiebreak`` order with NULL
    smallest, so an oracle twin must order ``ASC NULLS FIRST``.
    """
    keys = list(keys)
    order_cols = (
        list(tiebreak) if tiebreak else [c for c in df.columns if c not in keys]
    )
    rest = [c for c in df.columns if c not in keys and c not in order_cols]
    packed = df.groupBy(*keys).agg(
        F.min(F.struct(*(order_cols + rest))).alias("__survivor")
    )
    unpacked = packed.select(
        *keys, *[F.col(f"__survivor.{c}").alias(c) for c in order_cols + rest]
    )
    return unpacked.select(*df.columns)


def latest_by(
    df: DataFrame, keys: Sequence[str], order_cols: Sequence[str]
) -> DataFrame:
    """CDC latest-state compaction: keep the row with the GREATEST
    ``order_cols`` per key — the latest-wins twin of
    :func:`dedup_keyed_deterministic` (same single partial-aggregated
    ``max(struct(...))`` pass, no window sort), used to collapse a
    change stream into current state.  Remaining columns join the
    comparison struct after ``order_cols`` so ties resolve
    deterministically; oracle twin: ``row_number() OVER (PARTITION BY
    keys ORDER BY order_cols DESC NULLS LAST, rest DESC NULLS LAST)
    = 1`` (struct max puts NULL smallest, so DESC must sort nulls
    last)."""
    keys = list(keys)
    order_cols = list(order_cols)
    rest = [c for c in df.columns if c not in keys and c not in order_cols]
    packed = df.groupBy(*keys).agg(
        F.max(F.struct(*(order_cols + rest))).alias("__survivor")
    )
    unpacked = packed.select(
        *keys, *[F.col(f"__survivor.{c}").alias(c) for c in order_cols + rest]
    )
    return unpacked.select(*df.columns)


def duplicate_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """F1/A1 — the reference's duplicate-detection diagnostic
    (scripts/etl.py:54): group by all (or ``subset``) columns and keep
    groups with count > 1."""
    cols = list(subset) if subset else df.columns
    return df.groupBy(*cols).count().filter(F.col("count") > 1)


def drop_nulls(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """F2 — ``na.drop`` (reference scripts/etl.py:58)."""
    return df.na.drop(subset=list(subset) if subset else None)


def top_k(
    df: DataFrame,
    order_by: Sequence[Column | str],
    k: int,
) -> DataFrame:
    """O1/O2 — global top-k.  ``orderBy(...).limit(k)`` compiles to
    TakeOrderedAndProject: each partition keeps a k-heap, only k rows
    per partition reach the driver-side merge — no total sort."""
    return df.orderBy(*order_by).limit(k)


def grouped_top_k(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Top-k per group via a rank window — one shuffle on the group key.
    ``rank_col`` must not collide with an input column: the helper rank
    is dropped on the way out, so a collision would silently destroy
    the caller's column."""
    from pyspark.sql import Window

    if rank_col in df.columns:
        raise ValueError(
            f"rank_col {rank_col!r} collides with an input column; "
            "pass a unique helper name"
        )
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
        .drop(rank_col)
    )


def scd2_intervals(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tiebreak: Sequence[str] = (),
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type-2 history: every change row
    becomes a VERSION with a validity interval — ``valid_from`` is the
    row's own ``ts_col``, ``valid_to`` the NEXT change's (half-open
    ``[from, to)``), and the latest version per key carries NULL
    ``valid_to`` + ``is_current = true``.  The historical complement
    of :func:`latest_by`: that collapses a change stream to current
    state, this preserves every state with the time range it held, so
    as-of queries become a plain range predicate
    (``valid_from <= t AND (valid_to > t OR valid_to IS NULL)``).

    One ``lead()`` window per key — a single shuffle on the key, the
    same partitioning any downstream per-key query wants.  ``tiebreak``
    orders simultaneous changes deterministically (and must match the
    oracle's ORDER BY).
    """
    from pyspark.sql import Window

    order = [F.asc(ts_col)] + [F.asc(c) for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(valid_from, F.col(ts_col))
        .withColumn(valid_to, F.lead(ts_col).over(w))
        .withColumn(current_col, F.col(valid_to).isNull())
    )

"""Skew-handling primitives (SURVEY.md §4 "shuffle/partitioning").

AQE's skew-join splitting (on in ``session.py``) covers sort-merge
joins at runtime; these helpers cover the cases AQE can't touch — a
broadcast-ineligible dimension joined on a hot key, and heavy per-key
aggregation state — with the classic salting construction:

- the skewed (big) side gets a deterministic salt in ``[0, buckets)``
  derived by hashing the whole row, spreading one hot key over
  ``buckets`` shuffle partitions;
- the other side is replicated once per salt value (an ``explode`` of
  a literal range — ``buckets×`` its size, which is why this is for
  DIMENSION-sized right sides);
- the join/aggregation runs on ``(key, salt)`` and, for aggregations,
  a second cheap pass merges the per-salt partials.

Semantically transparent: results equal the unsalted operation (the
driver checks the salted join against a plain-SQL oracle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.functions.columns import cols_list

SALT_COL = "__salt"


def with_salt(df: DataFrame, buckets: int) -> DataFrame:
    """Attach a salt in ``[0, buckets)``: a hash of the full row plus a
    per-row sequence component.  The row hash alone would map
    EXACT-DUPLICATE rows of a hot key (a common skew shape — repeated
    events) onto one salt value, defeating the spread; feeding
    ``monotonically_increasing_id`` INTO the hash separates duplicates.
    The id goes in as a hash input, never as a long addition — summing
    a full-range ``xxhash64`` with the id overflows near
    ``Long.MAX``, and Spark 4 runs ANSI mode by default, so at
    billion-row scale the addition form crashes with
    ARITHMETIC_OVERFLOW.

    The salted frame is MATERIALIZED (``localCheckpoint(eager=True)``,
    the same pinning ``range_join`` applies to its ``__pid``): the id
    component is a function of partition layout and row position, so
    a map-task retry after a fetch failure would re-salt rows
    differently than the copies reducers already consumed — the
    SPARK-23207 silent double-count/drop class.  Checkpointing
    computes every salt exactly once; a lost checkpoint block then
    fails the job LOUDLY instead of corrupting partials.  Do not
    persist the salt as a stable row key across jobs."""
    return df.withColumn(
        SALT_COL,
        F.pmod(
            F.xxhash64(*df.columns, F.monotonically_increasing_id()),
            F.lit(buckets),
        ).cast("int"),
    ).localCheckpoint(eager=True)


def replicate_for_salt(df: DataFrame, buckets: int) -> DataFrame:
    """Cross the (small) side with every salt value — ``buckets×``
    blow-up, acceptable only for dimension-sized inputs."""
    return df.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left`` is large with skewed ``on`` keys and
    ``right`` is small but above the broadcast threshold.  Joins on
    ``(on..., salt)`` so the hot key's rows land in ``buckets``
    different shuffle partitions instead of one straggler task.

    Only left-preserving joins are accepted: the salting is
    transparent for inner/left/left_semi/left_anti (every left row
    carries exactly one salt; the replicated right side only ever
    matches or vanishes).  A right/full join would surface the
    ``buckets``× replicated right rows as spurious null-left output —
    rejected loudly rather than silently wrong."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports left-preserving joins only, got how={how!r}"
            " (a right/full join would emit the salt-replicated right rows)"
        )
    keys = cols_list(on)
    salted_left = with_salt(left, buckets)
    salted_right = replicate_for_salt(right, buckets)
    return salted_left.join(salted_right, on=keys + [SALT_COL], how=how).drop(SALT_COL)


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    buckets: int = 8,
    **aggs: tuple[str, str],
) -> DataFrame:
    """Two-phase aggregation for skewed grouping keys.

    ``aggs`` maps output column → ``(function, input_col)`` with
    function in {count, sum, min, max}: decomposable aggregates whose
    per-salt partials merge exactly (count merges by sum).  Phase 1
    aggregates on ``(keys..., salt)``; phase 2 merges partials per key
    — the hot key's heavy lifting happens in ``buckets`` parallel
    tasks, the second shuffle carries ``buckets`` rows per key.

    ``count`` follows SQL semantics: ``("count", col)`` counts NON-NULL
    values of ``col`` exactly like ``F.count(col)``; pass ``("count",
    "*")`` for a row count.
    """
    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    bad = {fn for _out, (fn, _c) in aggs.items() if fn not in merge_fn}
    if bad:
        raise ValueError(
            f"non-decomposable aggregate(s) {sorted(bad)}: salted "
            f"two-phase merging supports only {sorted(merge_fn)} "
            "(avg = sum/count composed by the caller)"
        )
    phase1 = with_salt(df, buckets).groupBy(*keys, SALT_COL).agg(
        *[
            getattr(F, fn)(
                F.lit(1) if (fn == "count" and col == "*") else col
            ).alias(out)
            for out, (fn, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            getattr(F, merge_fn[fn])(out).alias(out)
            for out, (fn, _col) in aggs.items()
        ]
    )

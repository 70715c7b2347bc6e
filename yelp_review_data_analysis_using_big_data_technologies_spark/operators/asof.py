"""As-of (nearest-timestamp) join — an operator Spark's DataFrame API
lacks natively, built as a composition of existing relational ops
(SURVEY.md §2.12; the (a)-tier strategy: no Python in the data path).

Semantics: for every left row, attach the single right row with the
greatest ``on`` ≤ left.``on`` (direction="backward"; ties match) or
the smallest ``on`` ≥ left.``on`` ("forward") within the same ``by``
group, optionally bounded by ``tolerance``.  Unmatched left rows keep
NULL match columns (left-outer semantics) — the same contract as
DuckDB's native ``ASOF LEFT JOIN``, which serves as the oracle twin.

Plan shape at scale (the whole point of this formulation): both
inputs are unioned and sorted ONCE per ``by``-partition —
``last(..., ignorenulls=True)`` over a running window propagates the
most recent right payload to each left row.  One shuffle on the group
key, zero join explosion, no per-key crossJoin; 1000-executor
behavior is a single sort-merge pass, exactly how a time-series
engine's as-of scan works.  A window-free broadcast variant is not
offered: an as-of by definition needs per-key time ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.functions.columns import cols_list


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "user_id",
    direction: str = "backward",
    tolerance: Column | None = None,
    match_prefix: str = "asof_",
    dedup_right: bool = True,
) -> DataFrame:
    """As-of join ``left`` with ``right`` (see module docstring).

    ``tolerance`` — optional max time gap as a Column interval
    (e.g. ``F.expr("INTERVAL 1 HOUR")``); matches farther than it are
    nulled out.  ``dedup_right=True`` deterministically collapses
    duplicate (by, on) right rows (keeps the lexicographically
    greatest payload) so the match is well-defined — drop it only
    when the right side is known unique.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by_cols = cols_list(by)

    r_payload = [c for c in right.columns if c not in {*by_cols, on}]
    # a right row with NULL ts can be "nearest" to nothing (the SQL
    # twin's inequality never matches it), but in the window
    # formulation it would sort to the partition edge and leak its
    # payload into early left rows as a NULL-ts match
    right = right.filter(F.col(on).isNotNull())
    r = right.select(
        *by_cols,
        F.col(on),
        F.struct(F.col(on).alias("__t"), *[F.col(c) for c in r_payload]).alias(
            "__rp"
        ),
    )
    if dedup_right:
        r = r.groupBy(*by_cols, on).agg(F.max("__rp").alias("__rp"))

    l = left.withColumn("__side", F.lit(1))
    r = r.withColumn("__side", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)

    # Backward: right rows sort BEFORE a left row at the same instant
    # (side 0 < 1) so equal timestamps match; running `last` carries
    # the latest right payload forward.  Forward mirrors it in reverse.
    if direction == "backward":
        w = (
            Window.partitionBy(*by_cols)
            .orderBy(F.asc(on), F.asc("__side"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = (
            Window.partitionBy(*by_cols)
            .orderBy(F.desc(on), F.asc("__side"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    matched = u.withColumn("__m", F.last("__rp", ignorenulls=True).over(w))

    out = matched.filter(F.col("__side") == 1)
    # NULL ts / NULL key → no match, matching the ASOF-join twin's
    # SQL semantics (NULL compares with nothing).  Without this, a
    # NULL-ts left row in the forward direction sorts past the last
    # point (desc nulls last) and picks up the series MINIMUM, and
    # NULL keys form a matching "group" the equality join never has.
    valid = F.col(on).isNotNull()
    for c in by_cols:
        valid = valid & F.col(c).isNotNull()
    out = out.withColumn("__m", F.when(valid, F.col("__m")))
    if tolerance is not None:
        gap_ok = (
            F.col(on) - F.col("__m.__t") <= tolerance
            if direction == "backward"
            else F.col("__m.__t") - F.col(on) <= tolerance
        )
        out = out.withColumn("__m", F.when(gap_ok, F.col("__m")))

    keep = [c for c in left.columns]
    return out.select(
        *keep,
        F.col("__m.__t").alias(f"{match_prefix}{on}"),
        *[F.col(f"__m.{c}").alias(f"{match_prefix}{c}") for c in r_payload],
    )

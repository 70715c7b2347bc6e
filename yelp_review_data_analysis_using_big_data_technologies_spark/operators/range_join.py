"""Range (interval-containment) join — point-in-interval matching
without a cartesian product (SURVEY.md §2.12 custom-operator tier).

Spark accepts ``l.ts BETWEEN r.start AND r.end`` join conditions but,
lacking an equi-key, plans them as BroadcastNestedLoopJoin — O(|L|·|R|)
comparisons, a non-starter at 100 TB.  This operator adds the missing
equi-key by time-bucketizing both sides: points land in one bucket,
intervals explode into every bucket they overlap, and the join runs as
a plain shuffle/broadcast HASH join on (keys…, bucket) followed by the
exact containment filter.  Work scales with |L| + Σ interval-spans,
and the shuffle key is the bucket — the standard spatial/temporal
binning trick.

Each matching pair is emitted exactly once with no dedup pass: a
point's bucket is unique, so the pair only materializes in the bucket
the point occupies.

Bucket width trades replication against selectivity: wide buckets
replicate intervals less but admit more false candidates; tune it to
≈ the median interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.functions.columns import cols_list


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point: str = "ts",
    start: str = "start",
    end: str = "end",
    by: str | list[str] | None = None,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each ``points`` row to every ``intervals`` row whose
    ``[start, end]`` contains it (closed on both ends), optionally
    key-scoped by ``by``.  ``how`` may be ``inner`` or ``left`` (left
    keeps pointless points with NULL interval columns)."""
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    by_cols = cols_list(by)
    clash = (set(points.columns) & set(intervals.columns)) - set(by_cols)
    if clash:
        raise ValueError(
            f"non-key columns must be disjoint; rename {sorted(clash)}"
        )

    def _bucket(c):
        return (F.unix_timestamp(F.col(c)) / bucket_seconds).cast("long")

    pts = points
    if how == "left":
        # surrogate row id: the unmatched-recovery anti-join below must
        # match a point row to ITSELF, which value-equality can't do
        # when any column is NULL (a matched row with a NULL column
        # would come back a second time as unmatched).  The id MUST be
        # materialized before the plan branches: the matched plan and
        # the anti-join side would otherwise evaluate
        # monotonically_increasing_id independently, and a
        # nondeterministically-ordered upstream (anything post-shuffle)
        # could number the same row differently in the two branches —
        # dropping matched rows or duplicating unmatched ones.
        pts = points.withColumn(
            "__pid", F.monotonically_increasing_id()
        ).localCheckpoint(eager=True)
    p = pts.withColumn("__b", _bucket(point))
    i = intervals.withColumn(
        "__b",
        F.explode(F.sequence(_bucket(start), _bucket(end))),
    )
    cond = [p["__b"] == i["__b"]] + [p[c] == i[c] for c in by_cols]
    joined = p.join(i, cond, "inner").where(
        p[point].between(i[start], i[end])
    )
    out_cols = (
        [p[c] for c in points.columns]
        + [i[c] for c in intervals.columns if c not in by_cols]
    )
    if how == "inner":
        return joined.select(*out_cols)
    # left: re-attach unmatched points (by surrogate id, null-safe)
    matched = joined.select(p["__pid"], *out_cols)
    unmatched = pts.join(
        matched.select("__pid").distinct(), on="__pid", how="left_anti"
    ).drop("__pid")
    for c in intervals.columns:
        if c not in by_cols:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(dict(intervals.dtypes)[c])
            )
    return matched.drop("__pid").unionByName(unmatched)

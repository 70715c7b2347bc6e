"""Per-key linear-interpolation join — evaluate a sampled value series
at arbitrary query timestamps (SURVEY.md §2.12; the (a)-tier strategy:
a composition of existing relational ops, no Python in the data path).

Semantics: for every query row ``(by, t)`` find the series points
``prev`` (greatest ts ≤ t) and ``next`` (smallest ts ≥ t) within the
same ``by`` group and return the linear interpolation::

    v(t) = prev.v + (next.v − prev.v) · (t − prev.ts) / (next.ts − prev.ts)

An exact-timestamp hit returns that point's value.  Outside the series
range the result clamps to the nearest endpoint (``extrapolate=
"clamp"``, numpy.interp's contract) or stays NULL (``"null"``).
Queries whose key has no series rows at all are NULL either way
(left-outer contract, matching the as-of join).  A NULL query
timestamp or NULL ``by`` key is NULL, full stop — SQL join semantics
(NULL matches nothing), pinned explicitly because the window
formulation would otherwise hand NULL-ts rows the series extremum
(desc ordering parks them past the last point) and group NULL keys
into a matching partition, both diverging from the ASOF-join twin.

Plan shape at scale — the reason this is NOT two joins: both inputs
union and sort ONCE per ``by`` partition (the asof_join formulation,
operators/asof.py); ``prev`` is a running ``last(ignorenulls)`` over
ascending time, ``next`` the same over descending time — two window
passes over one shuffle, zero join explosion.  Timestamps enter the
arithmetic as ``unix_micros`` integers so Spark and the DuckDB twin
(two native ASOF joins + identical lerp expression) agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.functions.columns import cols_list


def interpolate_join(
    queries: DataFrame,
    series: DataFrame,
    on: str = "ts",
    by: str | list[str] = "user_id",
    value_col: str = "value",
    out_col: str = "interp_value",
    extrapolate: str = "clamp",
) -> DataFrame:
    """Attach ``out_col`` = the series' linearly-interpolated value at
    each query row's timestamp (see module docstring).  Duplicate
    series points at one ``(by, on)`` instant collapse
    deterministically to the greatest value first."""
    if extrapolate not in ("clamp", "null"):
        raise ValueError("extrapolate must be 'clamp' or 'null'")
    by_cols = cols_list(by)

    # a series point with NULL ts belongs to no position on the time
    # axis — drop it (same reasoning as asof_join's right-side filter)
    series = series.filter(F.col(on).isNotNull())
    # cast("timestamp") first: parquet TIMESTAMP_NTZ columns reject
    # unix_micros directly, and the session pins UTC so the cast is
    # value-preserving.
    s = series.select(
        *by_cols,
        F.col(on),
        F.struct(
            F.unix_micros(F.col(on).cast("timestamp")).alias("__t"),
            F.col(value_col).cast("double").alias("__v"),
        ).alias("__sp"),
    )
    s = s.groupBy(*by_cols, on).agg(F.max("__sp").alias("__sp"))

    q = queries.withColumn("__side", F.lit(1))
    s = s.withColumn("__side", F.lit(0))
    u = q.unionByName(s, allowMissingColumns=True)

    # Series rows sort BEFORE a query row at the same instant (side
    # 0 < 1) in BOTH directions, so an exact-timestamp hit sees the
    # point as its prev AND its next.
    wb = (
        Window.partitionBy(*by_cols)
        .orderBy(F.asc(on), F.asc("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*by_cols)
        .orderBy(F.desc(on), F.asc("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = (
        u.withColumn("__prev", F.last("__sp", ignorenulls=True).over(wb))
        .withColumn("__next", F.last("__sp", ignorenulls=True).over(wf))
        .filter(F.col("__side") == 1)
    )

    t = F.unix_micros(F.col(on).cast("timestamp"))
    pt, pv = F.col("__prev.__t"), F.col("__prev.__v")
    nt, nv = F.col("__next.__t"), F.col("__next.__v")
    lerp = pv + (nv - pv) * (t - pt) / (nt - pt)
    interp = F.when(pt.isNotNull() & nt.isNotNull() & (nt != pt), lerp).when(
        pt.isNotNull() & nt.isNotNull(), pv
    )
    if extrapolate == "clamp":
        interp = interp.when(pt.isNotNull(), pv).when(nt.isNotNull(), nv)
    # NULL ts / NULL key → NULL (module docstring): without this guard
    # a NULL-ts query row clamps to the series extremum and NULL keys
    # interpolate against the NULL-key "group"
    valid = F.col(on).isNotNull()
    for c in by_cols:
        valid = valid & F.col(c).isNotNull()
    return m.select(
        *queries.columns, F.round(F.when(valid, interp), 6).alias(out_col)
    )


def interpolate_join_sql(
    queries_sql: str,
    series_sql: str,
    on: str = "ts",
    by: str = "user_id",
    value_col: str = "value",
    out_col: str = "interp_value",
    query_cols: str = "q.*",
    extrapolate: str = "clamp",
) -> str:
    """DuckDB twin: backward + forward native ASOF joins feeding the
    SAME lerp expression (``epoch_us`` integers, identical operation
    order) as :func:`interpolate_join`.  ``query_cols`` defaults to
    ``q.*`` — the Spark twin returns exactly the query columns, and a
    bare ``*`` would leak all three relations' duplicate ts/key
    columns into the shape.  The deduped series is a CTE so the twin
    aggregates it once, not once per ASOF side (DuckDB accepts WITH
    inside a derived table, so panels can still wrap this SQL)."""
    dedup = (
        f"SELECT {by}, {on}, max(CAST({value_col} AS DOUBLE)) AS __v "
        f"FROM ({series_sql}) GROUP BY {by}, {on}"
    )
    lerp = (
        f"p.__v + (n.__v - p.__v) * (epoch_us(q.{on}) - epoch_us(p.{on}))"
        f" / (epoch_us(n.{on}) - epoch_us(p.{on}))"
    )
    clamp = (
        f"WHEN p.{on} IS NOT NULL THEN p.__v "
        f"WHEN n.{on} IS NOT NULL THEN n.__v "
        if extrapolate == "clamp"
        else ""
    )
    return (
        f"WITH __dedup AS ({dedup}) "
        f"SELECT {query_cols}, round(CASE "
        # explicit NULL-ts guard: DuckDB's native ASOF sorts a NULL
        # query ts past the series and hands it the extremum point, so
        # a single-point series would "clamp" a NULL timestamp — the
        # engine's contract is NULL in, NULL out
        f"WHEN q.{on} IS NULL THEN NULL "
        f"WHEN p.{on} IS NOT NULL AND n.{on} IS NOT NULL "
        f"  AND n.{on} <> p.{on} THEN {lerp} "
        f"WHEN p.{on} IS NOT NULL AND n.{on} IS NOT NULL THEN p.__v "
        f"{clamp}END, 6) + 0 AS {out_col} "
        f"FROM ({queries_sql}) q "
        f"ASOF LEFT JOIN __dedup p "
        f"  ON q.{by} = p.{by} AND q.{on} >= p.{on} "
        f"ASOF LEFT JOIN __dedup n "
        f"  ON q.{by} = n.{by} AND q.{on} <= n.{on}"
    )

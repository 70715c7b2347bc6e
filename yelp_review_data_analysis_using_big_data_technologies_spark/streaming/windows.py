"""Windowed streaming aggregations over the ``events`` table.

Design:

- ``stream_events`` reads the same parquet the batch path reads, as a
  stream (explicit schema — streams can't infer), normalizing the
  TIMESTAMP(NANOS) column exactly like ``sources.readers.load_table``.
- ``tumbling_counts`` is the tumbling-window count/sum aggregation;
  the SAME function body works under batch and streaming input — one
  definition, two execution modes, which is the whole point of
  Structured Streaming's unified model.
- ``run_available_now`` executes a streaming DataFrame to completion
  with the ``availableNow`` trigger into a memory sink and returns the
  result table: batch-replay semantics, so the driver's DuckDB oracle
  can check the output against plain GROUP BY SQL.

Watermark semantics (late-data policy) are covered by unit tests
rather than the oracle: in ``append`` mode a window only emits once
the watermark passes its end, so the trailing window is *held back* —
correct streaming behavior that plain batch SQL can't mirror.

At scale: the aggregation state is partitioned by (window,
event_type) — the shuffle key of the stateful operator; watermarks
bound the state size, and ``availableNow`` lets the same job run as
an incremental backfill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Explicit stream schema for events.parquet with a ``{ts}`` hole —
#: streams can't infer, and ``ts``'s declared type must match the
#: file's physical type (probed per-directory in ``stream_events``).
EVENTS_STREAM_SCHEMA = (
    "event_id long, ts {ts}, user_id long, event_type string, "
    "value double, props string"
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet, normalizing ``ts``
    exactly like the batch reader (sources/readers.py).

    Fixture generations have shipped ``ts`` as both TIMESTAMP(NANOS)
    (a long under ``nanosAsLong``) and TIMESTAMP(MICROS); declaring
    the wrong one silently mis-scales every window by 1000×, so the
    batch footer is probed first (metadata-only) and the stream schema
    + conversion follow the file."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probe = (
        spark.read.option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .schema["ts"]
        .dataType
    )
    ts_is_ns_long = isinstance(probe, T.LongType)
    # FileStreamSource wants a directory; the fixture is a single file,
    # so stream the directory with a glob filter on the file name.
    raw = (
        spark.readStream.schema(
            EVENTS_STREAM_SCHEMA.format(ts="long" if ts_is_ns_long else "timestamp")
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if ts_is_ns_long:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window event counts + value sums per event type.

    Works identically on a batch or streaming ``events`` frame.  Pass
    ``watermark`` (e.g. ``"30 minutes"``) on streams that must bound
    state / emit in append mode; leave ``None`` for complete-mode or
    batch execution.
    """
    # A tumbling window IS a sliding window whose slide equals its
    # width (F.window(ts, w) == F.window(ts, w, w)) — one shared body.
    return sliding_counts(
        events, window=window, slide=window, watermark=watermark
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window event counts + value sums per event type: each
    event contributes to ``window/slide`` overlapping windows (Spark
    materializes the replication inside the WindowExec, not as an
    explode).  Same batch/streaming duality as :func:`tumbling_counts`;
    state keys grow by the overlap factor, so watermarking matters
    more here than for tumbling windows."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts_sql(
    window_s: int = 3600, slide_s: int = 1800, table: str = "events"
) -> str:
    """DuckDB twin of :func:`sliding_counts`, GENERATED from the same
    dials (seconds) so a window/slide change cannot silently break
    oracle equality against a constant pinned to 1h/30m.  NULL-ts
    rows are excluded to mirror Spark's event-time contract
    (``F.window``/``session_window`` drop rows with no event time).  Each event
    lands in ``window_s / slide_s`` windows on the slide grid — its
    own slot and the ``k-1`` preceding ones — replicated with unnest.
    ``window_s`` must be a multiple of ``slide_s`` (Spark's window
    replication follows the same grid)."""
    if window_s % slide_s != 0:
        raise ValueError(
            f"window ({window_s}s) must be a multiple of slide ({slide_s}s)"
        )
    k = window_s // slide_s
    offsets = ", ".join(
        f"slot - INTERVAL {i * slide_s} SECOND" for i in range(k)
    )
    return f"""
WITH slotted AS (
  SELECT make_timestamp(CAST(floor(epoch(ts) / {slide_s}) AS BIGINT)
                        * {slide_s} * 1000000) AS slot,
         event_type, value
  FROM {table} WHERE ts IS NOT NULL
), w AS (
  SELECT unnest([{offsets}]) AS window_start,
         event_type, value
  FROM slotted
)
SELECT window_start, event_type, count(*) AS n,
       round(sum(value), 2) + 0 AS sum_value
FROM w GROUP BY 1, 2
"""


#: Legacy pinned twin (window=1h, slide=30m) — kept for existing
#: importers; new oracles should call :func:`sliding_counts_sql`.
SLIDING_COUNTS_SQL = sliding_counts_sql()


def tumbling_ohlc(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Streaming OHLC bars: the batch resampling primitive
    (operators/ohlc.py) under Structured-Streaming state — open and
    close ride the same deterministic ``min(struct)``/``max(struct)``
    selection, which is ORDER-AGNOSTIC and therefore safe under
    micro-batch replay and shuffle alike (``F.first`` over a stream
    would depend on arrival order).  State per (window, key) is one
    struct pair plus the scalar aggregates — O(1) per bar, the same
    footprint as a count.

    Batch/streaming duality as :func:`tumbling_counts`; pass
    ``watermark`` for append-mode emission, leave ``None`` for
    complete-mode/batch.  Rows with NULL, NaN, or ±Inf value are
    dropped — the SAME guard as the batch ``ohlc_bars``
    (operators/ohlc.py), so the streaming form never diverges from
    its batch twin when a non-finite tick arrives (a NaN would poison
    ``high``/``total_value`` for the whole bar; NULL ts rows are
    dropped by ``F.window`` itself).  NULL ids coalesce to the batch
    operator's sentinel so tie-breaks agree with the batch twin
    everywhere.
    """
    from yelp_review_data_analysis_using_big_data_technologies_spark.operators.ohlc import _NULL_ID_SENTINEL

    src = events.withWatermark("ts", watermark) if watermark else events
    v = F.col("value")
    finite = v.isNotNull() & ~F.isnan(v) & (F.abs(v) != F.lit(float("inf")))
    staged = src.where(finite).select(
        F.col("ts"),
        F.col("event_type"),
        F.coalesce(F.col("event_id"), F.lit(_NULL_ID_SENTINEL)).alias(
            "__id"
        ),
        v.alias("__v"),
    )
    sel = F.struct("ts", "__id", "__v")
    return (
        staged.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.min(sel).getField("__v").alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.max(sel).getField("__v").alias("close"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("__v"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n",
            "total_value",
        )
    )


def tumbling_ohlc_sql(window_s: int = 3600, table: str = "events") -> str:
    """DuckDB twin of :func:`tumbling_ohlc` — same epoch-floor window
    grid as :func:`sliding_counts_sql`, same row_number argmin/argmax
    formulation as the batch OHLC twin."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.operators.ohlc import _NULL_ID_SENTINEL

    return f"""
WITH e AS (
  SELECT make_timestamp(CAST(floor(epoch(ts) / {window_s}) AS BIGINT)
                        * {window_s} * 1000000) AS window_start,
         event_type, ts,
         COALESCE(event_id, {_NULL_ID_SENTINEL}) AS __id,
         value AS __v
  FROM {table}
  WHERE ts IS NOT NULL AND value IS NOT NULL AND isfinite(value)
), r AS (
  SELECT *,
    row_number() OVER (PARTITION BY event_type, window_start
                       ORDER BY ts, __id, __v) AS __ra,
    row_number() OVER (PARTITION BY event_type, window_start
                       ORDER BY ts DESC, __id DESC, __v DESC) AS __rd
  FROM e
)
SELECT window_start, event_type,
       max(CASE WHEN __ra = 1 THEN __v END) AS open,
       max(__v) AS high,
       min(__v) AS low,
       max(CASE WHEN __rd = 1 THEN __v END) AS close,
       count(*) AS n,
       round(sum(__v), 6) + 0 AS total_value
FROM r GROUP BY 1, 2
"""


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based sessionization via Spark's native ``session_window``:
    consecutive events of a user belong to one session while each
    arrives within ``gap`` of the previous.  Boundary semantics
    (verified empirically): an event exactly ``gap`` after its
    predecessor still MERGES — a new session starts only when the
    difference is strictly greater than ``gap``.

    Works on batch and, with ``watermark``, on streams — session state
    is partitioned by (user, session-window), the stateful operator's
    shuffle key; the watermark bounds how long an open session is held.

    Output: one row per session with start, last event time, event
    count and value sum.
    """
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), user_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            "last_ts",
            "n_events",
            "sum_value",
        )
    )


#: DuckDB twin of :func:`sessionize` — the lag/cumulative-sum
#: formulation of the same gap rule (new session iff diff is STRICTLY
#: greater than the gap, matching session_window's boundary merge).
def sessionize_sql(gap_s: int = 1800, table: str = "events") -> str:
    """DuckDB twin of :func:`sessionize`, GENERATED from the same gap
    (seconds) — same break rule (strictly-greater gap starts a new
    session) as the Spark gaps-and-islands build.  NULL-ts rows are
    excluded (Spark ``session_window`` drops them; a NULL user_id
    still forms its own session partition in both engines)."""
    return f"""
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL {gap_s} SECOND
              THEN 1 ELSE 0 END AS brk
  FROM {table} WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id, min(ts) AS session_start, max(ts) AS last_ts,
       count(*) AS n_events, round(sum(value), 2) + 0 AS sum_value
FROM s GROUP BY user_id, sid
"""


#: Legacy pinned twin (gap=30m) — kept for existing importers; new
#: oracles should call :func:`sessionize_sql`.
SESSIONIZE_SQL = sessionize_sql()


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming deduplication with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps a key in the state store
    only until the watermark passes its event time, so state size
    tracks the watermark horizon instead of growing forever the way
    plain ``dropDuplicates`` state does on an unbounded stream.  The
    operator guarantees suppression of duplicates arriving within the
    watermark window of first sight — the right tool for at-least-once
    sources (e.g. replayed Kafka offsets) where duplicates cluster
    near each other in time."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def stream_to_parquet(
    result: DataFrame,
    path: str,
    checkpoint: str,
    output_mode: str = "append",
) -> None:
    """Production streaming sink: parquet files + checkpointed offsets.

    The checkpoint directory carries source offsets and sink commit
    log, so re-running the SAME query (e.g. an ``availableNow``
    backfill job on a cron) resumes where the last run stopped and
    writes each input row exactly once — the file-sink commit protocol
    makes partial task output invisible to readers.  This is the
    scale-out replacement for the memory sink used in tests."""
    q = (
        result.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_available_now(
    result: DataFrame,
    query_name: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Execute a streaming DataFrame to completion (``availableNow``)
    into a memory sink; returns the sink table.

    ``availableNow`` processes everything currently in the source then
    stops — deterministic batch-replay, which is what makes the result
    oracle-checkable.  Memory sink is for tests/verification; the
    production path is ``writers`` (parquet) with checkpointing.
    """
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = result.sparkSession
    return spark.table(query_name)

"""Stream-stream joins and merge sinks (SURVEY.md §2.10 extension).

Two pieces the windowed-aggregation layer doesn't cover:

- :func:`stream_stream_interval_join` — joining two live streams.
  Unlike a stream-static join, BOTH sides buffer state; the join is
  only feasible because (a) an equi-key partitions the state
  (shuffle key = user), and (b) watermarks + a time-range predicate
  bound how long each side's rows are retained.  Without the range
  condition Spark would have to keep every past row forever.
- :func:`stream_merge_to_parquet` — a ``foreachBatch`` sink that
  MERGES each micro-batch into a partitioned parquet table via
  ``writers.upsert_by_key`` (keyed upsert, partition-pruned rewrite)
  instead of appending files: the streaming path to a continuously
  deduplicated serving table.  foreachBatch gives the batch writer's
  full API per micro-batch while the checkpoint tracks source
  offsets, so a crashed job re-merges its last batch idempotently
  (same keys → same replacement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    lookback: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner-join two event streams on ``by`` where the right event
    falls within ``[left_ts - lookback, left_ts]`` — "enrich every
    click with the purchases of the preceding hour".

    State bounds: both sides are watermarked, and the interval
    condition lets Spark evict a buffered right row once the left
    watermark passes ``right_ts + lookback`` (and vice versa).  The
    same body executes in batch mode, which is how the oracle checks
    it.  Column names must already be disjoint apart from ``by``.
    """
    is_streaming = left.isStreaming or right.isStreaming
    l = left.withWatermark(left_ts, watermark) if is_streaming else left
    r = right.withWatermark(right_ts, watermark) if is_streaming else right
    cond = (
        f"l.{by} = r.{by} AND "
        f"{left_ts} - INTERVAL {lookback} <= {right_ts} "
        f"AND {right_ts} <= {left_ts}"
    )
    return (
        l.alias("l")
        .join(r.alias("r"), F.expr(cond), "inner")
        .select(
            F.col(f"l.{by}").alias(by),
            *[F.col(f"l.{c}") for c in left.columns if c != by],
            *[F.col(f"r.{c}") for c in right.columns if c != by],
        )
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
    hint_broadcast: bool = True,
) -> DataFrame:
    """Stream-static join: enrich a live stream against a BATCH
    dimension table.  No state is buffered for the static side — it is
    re-executed per micro-batch — and with the broadcast hint every
    executor joins map-side with zero stream-side shuffle: the right
    default for dimension-sized enrichment at any stream rate.  The
    same body runs in batch mode, which is how the oracle checks it.

    Dim-refresh caveat: for a PATH-based parquet ``dim`` the file
    listing is snapshotted when the DataFrame is created, so
    re-execution re-reads the SAME files — an external overwrite of
    the dim path is not picked up (and deleting the old files fails
    the next micro-batch's tasks).  To follow a refreshing dimension,
    re-create the dim frame per batch inside ``foreachBatch``, or use
    a catalog/table format whose snapshots refresh."""
    d = F.broadcast(dim) if hint_broadcast else dim
    return stream.join(d, on=on, how=how)


def _is_missing_table(exc) -> bool:
    """True iff an ``AnalysisException`` from a read probe means "no
    table here yet" (bootstrap), as opposed to a table that EXISTS but
    cannot be read (schema corruption, permission failure, a crash
    mid-overwrite).  Conflating the two would let a merge sink silently
    reinitialize an accumulated view from one micro-batch — so any
    other failure propagates loudly instead of bootstrapping."""
    get_cls = getattr(exc, "getErrorClass", None)
    cls = (get_cls() if callable(get_cls) else None) or ""
    missing = {"PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"}
    if cls:
        return cls in missing
    return any(m in str(exc) for m in missing)


def stream_merge_to_parquet(
    result: DataFrame,
    path: str,
    checkpoint: str,
    keys: list[str],
    partition_by: list[str],
    version_col: str | None = None,
) -> None:
    """Run a stream to completion (``availableNow``), MERGING each
    micro-batch into the parquet table at ``path``: same-key rows are
    replaced, new keys insert, only touched partitions rewrite
    (``writers.upsert_by_key``).  First batch bootstraps the table.

    Default replace semantics are LAST-DELIVERED-WINS — correct only
    when the source delivers each key's versions in order, exactly
    once.  At-least-once CDC sources replay and overlap batches, and a
    stale row in a later batch would then REGRESS its key.  Pass
    ``version_col`` (the CDC event's ordering column — LSN, commit ts,
    sequence number) for LATEST-VERSION-WINS: the merged table
    converges to the per-key max-version state under any delivery
    order, overlap, or replay (``writers.latest_version_rows``; the
    bootstrap batch is collapsed through the same window so the table
    is key-unique from birth).

    Bootstrap-vs-merge is decided by probing the table THROUGH the
    reader (catching ``AnalysisException``), not ``os.path.exists`` —
    a local-FS-only check would see nothing on HDFS/S3 and silently
    overwrite the table every micro-batch; the reader probe follows
    whatever filesystem the path's scheme names."""
    from pyspark.errors import AnalysisException

    from yelp_review_data_analysis_using_big_data_technologies_spark.sources.writers import (
        latest_version_rows,
        upsert_by_key,
        write_parquet,
    )

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            # cheap metadata-only probe: resolves footers, reads no rows
            spark.read.parquet(path).schema
            exists = True
        except AnalysisException as exc:
            # PATH_NOT_FOUND / UNABLE_TO_INFER_SCHEMA (empty dir):
            # either way there is no table yet.  Anything else (the
            # table exists but is unreadable) must NOT bootstrap — it
            # would replace the accumulated view with this batch alone.
            if not _is_missing_table(exc):
                raise
            exists = False
        if not exists:
            first = (
                batch_df
                if version_col is None
                else latest_version_rows(None, batch_df, keys, version_col)
            )
            write_parquet(first, path, partition_by=partition_by)
        else:
            upsert_by_key(
                spark,
                path,
                batch_df,
                keys=keys,
                partition_by=partition_by,
                version_col=version_col,
            )

    q = (
        result.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_increment_counts_to_parquet(
    events: DataFrame,
    path: str,
    checkpoint: str,
    keys: list[str],
    count_col: str = "n",
    sum_col: str | None = None,
    sum_src: str | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Incremental MATERIALIZED-VIEW maintenance: each micro-batch's
    per-key partial counts (and optional value sums) merge ADDITIVELY
    into the parquet aggregate table — existing keys gain the batch's
    partials, new keys insert.  The complement of
    :func:`stream_merge_to_parquet`'s replace-merge: replace maintains
    latest-state views, additive maintains COUNT/SUM views — the two
    merge semantics that make a streaming pipeline's derived tables
    incremental instead of nightly full recomputes.

    Per batch: one partial agg over the (small) micro-batch, an outer
    merge against the view keyed rows, one rewrite.  With
    ``partition_by`` (a subset of ``keys``) the rewrite is
    PARTITION-PRUNED, the same shape as ``upsert_by_key``: only the
    partitions the batch's partials touch are read, merged, and
    dynamically overwritten — the rewritten byte volume follows the
    batch's key locality, not the view's width.  A time-derived
    partition key (hour/day) makes steady-state batches touch one or
    two partitions of an ever-growing view.  Unpartitioned, the whole
    (aggregate-sized) view rewrites per batch.

    Exactly-once needs more than foreachBatch's replay here: additive
    merges are NOT naturally idempotent (a replayed batch would add
    its partials twice — unlike the replace-merge above).  The view
    therefore carries a ``__max_batch_id`` watermark column, and the
    replay skip is decided PER PARTITION: the multi-partition dynamic
    overwrite is not atomic, so a crash mid-commit can leave some
    touched partitions committed and others not — a replayed batch
    re-merges exactly the partitions whose watermark has not reached
    it and leaves committed ones untouched (unpartitioned views use
    the single global watermark; one directory, one commit).  A read probe that fails
    for any reason OTHER than path-missing raises instead of
    bootstrapping — see :func:`_is_missing_table`."""
    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    from yelp_review_data_analysis_using_big_data_technologies_spark.sources.writers import (
        overwrite_partitions_dynamic,
        partition_prune_predicate,
        write_parquet,
    )

    if partition_by and not set(partition_by) <= set(keys):
        raise ValueError(
            "partition_by must be a subset of the aggregation keys: "
            f"{partition_by} vs {keys}"
        )

    def _agg(df: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias(count_col)]
        if sum_col is not None:
            aggs.append(F.sum(sum_src or sum_col).alias(sum_col))
        return df.groupBy(*keys).agg(*aggs)

    def _additive(current: DataFrame, partial: DataFrame) -> DataFrame:
        return (
            current.unionByName(partial)
            .groupBy(*keys)
            .agg(
                F.sum(count_col).alias(count_col),
                *(
                    [F.sum(sum_col).alias(sum_col)]
                    if sum_col is not None
                    else []
                ),
                F.max("__max_batch_id").alias("__max_batch_id"),
            )
        )

    def _read_current(spark, partial: DataFrame) -> DataFrame:
        """Read the view back with partition values in the PARTIAL's
        types, not parquet type inference's: a string partition value
        with numeric shape ("01" → inferred int 1) would never match
        the batch's tuples in the replay-skip set, so a replayed batch
        would re-merge an already-committed partition and double-add
        its partials — and the rewrite would land in a NEW directory
        (k=1 beside k=01).  Inference off → directory strings → cast
        to the batch frame's own partition dtypes."""
        if not partition_by:
            return spark.read.parquet(path)
        conf = "spark.sql.sources.partitionColumnTypeInference.enabled"
        prev = spark.conf.get(conf, "true")
        spark.conf.set(conf, "false")
        try:
            cur = spark.read.parquet(path)
        finally:
            spark.conf.set(conf, prev)
        for c in partition_by:
            cur = cur.withColumn(c, F.col(c).cast(partial.schema[c].dataType))
        return cur

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        partial = _agg(batch_df).withColumn(
            "__max_batch_id", F.lit(batch_id).cast("long")
        )
        try:
            current = _read_current(spark, partial)
        except AnalysisException as exc:
            if not _is_missing_table(exc):
                raise  # existing-but-unreadable view: never reinit
            write_parquet(partial, path, partition_by=partition_by)
            return
        if partition_by:
            if not partial.head(1):
                return  # empty batch: zero partitions to touch
            # The replay skip must be decided PER PARTITION, not from
            # one global max: the multi-partition dynamic overwrite is
            # not atomic, so a crash mid-commit can leave SOME touched
            # partitions carrying this batch's watermark while others
            # never committed.  A global `max >= batch_id` skip would
            # then drop the uncommitted partitions' partials forever.
            # Partitions already at >= batch_id are left untouched
            # (their directories are not rewritten); the rest merge.
            touched = partial.select(*partition_by).distinct().collect()
            pruned = current.filter(
                partition_prune_predicate(current, touched, partition_by)
            )
            done = {
                tuple(r[c] for c in partition_by)
                for r in pruned.groupBy(*partition_by)
                .agg(F.max("__max_batch_id").alias("__mb"))
                .collect()
                if r["__mb"] is not None and r["__mb"] >= batch_id
            }
            todo = [
                r
                for r in touched
                if tuple(r[c] for c in partition_by) not in done
            ]
            if not todo:
                return  # replayed batch: every partition already merged
            pruned_todo = current.filter(
                partition_prune_predicate(current, todo, partition_by)
            )
            partial_todo = partial.filter(
                partition_prune_predicate(partial, todo, partition_by)
            )
            # materialize before overwriting the partitions being read
            out = _additive(pruned_todo, partial_todo).localCheckpoint(
                eager=True
            )
            overwrite_partitions_dynamic(out, path, partition_by)
            return
        applied = current.agg(F.max("__max_batch_id")).first()[0]
        if applied is not None and batch_id <= applied:
            return  # replayed batch: already merged (single directory)
        out = _additive(current, partial).localCheckpoint(eager=True)
        write_parquet(out, path)

    q = (
        events.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_vectors_to_ivf_index(
    vectors: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Run an embedding stream to completion (``availableNow``),
    merging each micro-batch into a PERSISTED IVF index
    (:func:`llm.vectors.add_to_ivf_index`) — continuous retrieval-index
    maintenance: vectors land in their coarse cells as they arrive,
    searches between batches see a consistent pruned layout, and each
    micro-batch rewrites only the cell partitions it touches.

    The index (cells + centroids) must exist — build it once with
    :func:`llm.vectors.build_ivf_index`; an assignment against
    centroids that do not exist yet is meaningless, so a missing index
    raises rather than bootstrapping from one batch's vectors (whose
    seeds would silently disagree with every later batch).

    Replay safety (r12): ``add_to_ivf_index`` now UPSERTS by id —
    existing copies of the batch's ids are replaced within the
    touched cells (including the PRIOR cell of a re-assigned vector),
    so replaying a batch after a crash leaves the cells bit-identical
    and no reader-side dedup is needed.

    The bootstrap-capable sibling is :func:`streaming.ingest
    .stream_ann_index_ingest` (first non-empty batch BUILDS the
    index, freezing its seed quantizer); this merge-only form is for
    indexes whose quantizer was deliberately trained elsewhere."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.llm.vectors import add_to_ivf_index

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        add_to_ivf_index(
            batch_df, index_path, id_col=id_col, vec_col=vec_col
        )

    q = (
        vectors.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

"""Streaming drift monitoring — the continuous form of the batch
drift family (operators/drift.py): every micro-batch of a value
stream is scored against a STATIC reference snapshot and the
per-batch PSI profile lands in a result table, so a dashboard (or a
circuit breaker) watches the drift trajectory as data arrives — the
"alert me when the new day's distribution leaves the training
snapshot's shape" loop every feature store runs.

Shape per micro-batch: the reference's bucket edges are computed
ONCE up front (a 1-row relation the monitor reuses — frozen edges are
the PSI convention AND what makes per-batch profiles comparable to
each other), so each batch costs one tagged-union aggregate over
``reference ∪ batch``.  Replay safety: results write via dynamic
partition overwrite of the batch's OWN ``ingest_batch`` partition
(the ingest.py idiom) — a replayed batch id overwrites itself instead
of duplicating rows.

At 100 TB the reference side of the union is the dominant cost, so
the PSI monitor FREEZES it (r11): ``psi_freeze_reference`` scans the
snapshot once up front (edges + per-bucket counts, a bounded
driver-side literal), and each micro-batch score
(``psi_profile_frozen``) touches only the batch — per-batch cost is
∝ batch, with output bit-identical to the live two-sided
``psi_profile`` (pinned in tests/test_drift.py), so the streaming
rows still hash against the exact batch twin.  The KS monitor keeps
the two-sided form (its reference state is the full distinct-value
CDF, not a bounded sketch) but stages the reference ONCE across the
run instead of rescanning it per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_psi_monitor(
    stream: DataFrame,
    reference: DataFrame,
    out_path: str,
    checkpoint: str,
    value_col: str = "value",
    buckets: int = 10,
) -> None:
    """Drain ``stream`` (``availableNow``) scoring each micro-batch's
    ``value_col`` distribution against ``reference`` with
    :func:`~...operators.drift.psi_profile`; per-batch profiles land
    partitioned by ``ingest_batch`` at ``out_path``."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import release_staging
    from yelp_review_data_analysis_using_big_data_technologies_spark.operators.drift import (
        psi_freeze_reference,
        psi_profile_frozen,
    )

    # ONE reference scan for the whole run: edges + per-bucket counts
    # collapse to a bounded driver-side literal every batch reuses
    frozen = psi_freeze_reference(
        reference, value_col=value_col, buckets=buckets
    )

    def _score(batch: DataFrame, batch_id: int) -> None:
        # empty micro-batches are scored too (an empty cur side is an
        # all-zero cur_n column over the full bucket spine): skipping
        # them would shift alignment between written partitions and
        # the twin's declared batch indices
        out = psi_profile_frozen(batch, frozen, value_col=value_col)
        try:
            (
                out.withColumn("ingest_batch", F.lit(int(batch_id)))
                .coalesce(1)
                .write.partitionBy("ingest_batch")
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(out_path)
            )
        finally:
            # per-batch staging release (the ingest.py discipline):
            # psi_profile stages its bucket relation, and an unreleased
            # stream accumulates pinned blocks batch after batch
            release_staging(blocking=True)

    (
        stream.writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def stream_ks_monitor(
    stream: DataFrame,
    reference: DataFrame,
    out_path: str,
    checkpoint: str,
    value_col: str = "value",
    buckets: int = 32,
) -> None:
    """Drain ``stream`` (``availableNow``) scoring each micro-batch
    against ``reference`` with the EXACT two-sample KS statistic
    (:func:`~...operators.drift.ks_2sample`, a = reference, b =
    batch); the one-row-per-batch verdicts land partitioned by
    ``ingest_batch`` at ``out_path`` — the distribution-free
    complement to :func:`stream_psi_monitor` (PSI needs the binning
    convention; KS asks only "did the CDF move").

    Per-batch cost: batch sizes are bounded, so the two-level CDF
    decomposition runs with its usual bounded max-task; the reference
    side of the union dominates, amortizable exactly as documented on
    the PSI monitor.  Replay-safe the same way (a replayed batch id
    overwrites its own partition).  Empty micro-batches are scored
    too — ``n_b = 0`` yields a NULL ``ks_stat`` row, keeping written
    partitions aligned with the twin's batch indices."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import (
        release_staging,
        stage,
        staging_scope,
    )
    from yelp_review_data_analysis_using_big_data_technologies_spark.operators.drift import ks_2sample

    # the reference's distinct-value CDF state is not a bounded sketch
    # (unlike the PSI edges+counts), so it cannot collapse to driver
    # literals — but it CAN be computed once: stage the reference
    # relation for the whole run instead of rescanning it per batch.
    # Named scope: foreachBatch runs on the STREAM EXECUTION thread,
    # whose per-batch release must not evict the cross-thread ref.
    from yelp_review_data_analysis_using_big_data_technologies_spark.operators.drift import (
        ks_side_counts,
    )

    ref_tag = f"stream_ks_monitor_ref:{out_path}"
    with staging_scope(ref_tag):
        # r15 opt: the reference's per-distinct-value counts are
        # batch-independent, so they aggregate ONCE per run (staged +
        # eagerly filled) and each micro-batch merges its own counts
        # against them — per-batch cost ∝ batch, not ∝ reference
        # (integer merge ≡ the old per-batch union+aggregate, so the
        # statistic is bitwise unchanged).  The cache holds the counts
        # HASH-PARTITIONED on the merge key: the cached partitioning
        # satisfies the per-batch join's distribution requirement, so
        # each batch shuffles only its OWN counts (guide §2.4 — two
        # operations keyed the same way share one exchange).
        ref_counts = stage(
            ks_side_counts(reference, value_col).repartition("__v")
        )
    ref_counts.count()

    def _score(batch: DataFrame, batch_id: int) -> None:
        out = ks_2sample(
            reference,
            batch,
            value_col=value_col,
            buckets=buckets,
            a_counts=ref_counts,
        )
        try:
            (
                out.withColumn("ingest_batch", F.lit(int(batch_id)))
                .coalesce(1)
                .write.partitionBy("ingest_batch")
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(out_path)
            )
        finally:
            # releases ks_2sample's per-batch stagings (stream-thread
            # scope) — the named ref scope is untouched
            release_staging(blocking=True)

    try:
        (
            stream.writeStream.foreachBatch(_score)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    finally:
        release_staging(blocking=True, tag=ref_tag)


def stream_ks_monitor_sql(
    ref_sql: str,
    batch_sqls: list[str],
    value_col: str = "value",
) -> str:
    """DuckDB twin of :func:`stream_ks_monitor` — the batch KS twin
    per micro-batch, batch-tagged and unioned (batches are
    independent given the frozen reference)."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.operators.drift import ks_2sample_sql

    parts = [
        f"SELECT {k} AS ingest_batch, * FROM ("
        + ks_2sample_sql(ref_sql, bsql, value_col=value_col)
        + ")"
        for k, bsql in enumerate(batch_sqls)
    ]
    return (
        "SELECT * FROM (\n"
        + "\nUNION ALL\n".join(parts)
        + "\n) ORDER BY ingest_batch"
    )


def stream_chi2_monitor(
    stream: DataFrame,
    reference: DataFrame,
    out_path: str,
    checkpoint: str,
    cat_col: str = "event_type",
) -> None:
    """Drain ``stream`` (``availableNow``) scoring each micro-batch's
    CATEGORY MIX against ``reference`` with Pearson χ²
    (:func:`~...operators.drift.chi2_drift_frozen`) — the categorical
    leg completing the streaming drift panel (PSI: binned continuous;
    KS: distribution-free continuous; χ²: category mix).  The
    reference's per-category counts are frozen once (bounded by the
    category domain), so per-batch cost is one batch scan; per-batch
    profiles land partitioned by ``ingest_batch`` (replay-safe
    dynamic overwrite).  Empty micro-batches are scored too (all-zero
    cur_n over the reference's categories)."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import release_staging
    from yelp_review_data_analysis_using_big_data_technologies_spark.operators.drift import (
        chi2_drift_frozen,
        chi2_freeze_reference,
    )

    frozen = chi2_freeze_reference(reference, cat_col=cat_col)

    def _score(batch: DataFrame, batch_id: int) -> None:
        out = chi2_drift_frozen(batch, frozen, cat_col=cat_col)
        try:
            (
                out.withColumn("ingest_batch", F.lit(int(batch_id)))
                .coalesce(1)
                .write.partitionBy("ingest_batch")
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(out_path)
            )
        finally:
            release_staging(blocking=True)

    (
        stream.writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def stream_chi2_monitor_sql(
    ref_sql: str,
    batch_sqls: list[str],
    cat_col: str = "event_type",
) -> str:
    """DuckDB twin of :func:`stream_chi2_monitor` — the batch χ² twin
    per micro-batch, batch-tagged and unioned."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.operators.drift import chi2_drift_sql

    parts = [
        f"SELECT {k} AS ingest_batch, * FROM ("
        + chi2_drift_sql(ref_sql, bsql, cat_col=cat_col)
        + ")"
        for k, bsql in enumerate(batch_sqls)
    ]
    return (
        "SELECT * FROM (\n"
        + "\nUNION ALL\n".join(parts)
        + "\n) ORDER BY ingest_batch, category"
    )


def stream_psi_monitor_sql(
    ref_sql: str,
    batch_sqls: list[str],
    value_col: str = "value",
    buckets: int = 10,
) -> str:
    """DuckDB twin of :func:`stream_psi_monitor` — the batch PSI twin
    per micro-batch, batch-tagged and unioned (each micro-batch's
    profile is independent given the frozen reference, so the
    streaming run equals the per-batch batch computation by
    construction)."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.operators.drift import psi_profile_sql

    parts = [
        f"SELECT {k} AS ingest_batch, * FROM ("
        + psi_profile_sql(ref_sql, bsql, value_col=value_col, buckets=buckets)
        + ")"
        for k, bsql in enumerate(batch_sqls)
    ]
    return (
        "SELECT * FROM (\n"
        + "\nUNION ALL\n".join(parts)
        + "\n) ORDER BY ingest_batch, bucket"
    )

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

At 100 TB the reference side of the union is the dominant cost; a
deployment amortizes it by persisting the reference's per-bucket
counts once and unioning only the batch against frozen counts — kept
as the documented upgrade, while this implementation reuses
``psi_profile`` verbatim so the streaming rows hash against the exact
batch twin.
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
    from yelp_review_data_analysis_using_big_data_technologies_spark.operators.drift import psi_profile

    def _score(batch: DataFrame, batch_id: int) -> None:
        # empty micro-batches are scored too (psi_profile handles an
        # empty cur side — all-zero cur_n over the full bucket spine):
        # skipping them would shift alignment between written
        # partitions and the twin's declared batch indices
        out = psi_profile(reference, batch, value_col=value_col, buckets=buckets)
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
    from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import release_staging
    from yelp_review_data_analysis_using_big_data_technologies_spark.operators.drift import ks_2sample

    def _score(batch: DataFrame, batch_id: int) -> None:
        out = ks_2sample(
            reference, batch, value_col=value_col, buckets=buckets
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
            release_staging(blocking=True)

    (
        stream.writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


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

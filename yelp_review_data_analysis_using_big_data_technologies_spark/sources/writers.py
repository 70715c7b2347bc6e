"""Sinks (SURVEY.md §2.1, S3–S5, S7).

The reference coalesces to 1 partition for its final CSV/Parquet
writes (glue_job.py:88, scripts/etl.py:176) — a single-task write that
cannot scale.  Our writers default to partitioned multi-file output;
``coalesce`` is an explicit small-export option only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _validate_path(path: str) -> None:
    """Pre-write guard (S7; reference glue_job.py:84-85)."""
    if not path or not str(path).strip():
        raise ValueError("output path must be a non-empty string")


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    coalesce: int | None = None,
) -> None:
    """Parquet sink (S3).  At scale: pass ``partition_by`` (e.g.
    ["year", "month"]) so downstream reads get partition pruning;
    never ``coalesce`` below the cluster's write parallelism."""
    _validate_path(path)
    if coalesce is not None:
        df = df.coalesce(coalesce)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_json(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    coalesce: int | None = None,
) -> None:
    """JSON-lines sink — the inverse of the reference's ingest format
    (scripts/etl.py:21-27 reads Yelp JSON-lines); one JSON object per
    line, one file per partition unless ``coalesce`` is given."""
    _validate_path(path)
    if coalesce is not None:
        df = df.coalesce(coalesce)
    df.write.mode(mode).json(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    coalesce: int | None = None,
) -> None:
    """CSV sink with header (S4; reference glue_job.py:88-92).
    ``coalesce=1`` reproduces the reference's single-file export but is
    opt-in — the default writes one file per partition."""
    _validate_path(path)
    if coalesce is not None:
        df = df.coalesce(coalesce)
    df.write.mode(mode).option("header", header).csv(path)

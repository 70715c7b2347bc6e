"""Write-time data-quality gates via Spark's Observation API.

A pipeline write should not need a SECOND pass to learn it just
persisted garbage.  ``df.observe`` attaches aggregate metrics to the
write's own execution — they are computed by the SAME job that writes
the rows (zero extra scans, exactly the dbt-test/Great-Expectations
role without another framework) — and the gate raises AFTER the write
with the observed values, so operators both get the artifact and a
hard failure signal for orchestration.

At 100 TB this is the difference between "assert then write" (two full
scans) and "write with assertions" (one).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import Column, DataFrame, Observation

from .writers import write_parquet


class QualityGateError(RuntimeError):
    """A write's observed metrics violated an expectation."""

    def __init__(self, failures: dict[str, object]):
        self.failures = failures
        super().__init__(
            "quality gate failed: "
            + ", ".join(f"{k}={v!r}" for k, v in failures.items())
        )


def write_parquet_gated(
    df: DataFrame,
    path: str,
    metrics: Mapping[str, Column],
    expectations: Mapping[str, Callable[[object], bool]],
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> dict[str, object]:
    """Write ``df`` as parquet while observing ``metrics`` (name →
    aggregate Column) in the write job itself, then evaluate
    ``expectations`` (metric name → predicate over the observed value).
    Returns the observed metrics dict; raises :class:`QualityGateError`
    listing every violated metric.

    The gate fires after the write completes — the artifact exists for
    inspection, and orchestration (Airflow, CI) sees a hard failure
    before publishing/downstream steps.  For write-then-promote
    pipelines, point ``path`` at the staging location and promote only
    on success."""
    unknown = set(expectations) - set(metrics)
    if unknown:
        raise ValueError(
            "expectations reference unobserved metrics: "
            f"{sorted(unknown)} (observed: {sorted(metrics)})"
        )
    obs = Observation()
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    write_parquet(observed, path, mode=mode, partition_by=partition_by)
    got = obs.get
    failures = {
        name: got[name]
        for name, check in expectations.items()
        if not check(got[name])
    }
    if failures:
        raise QualityGateError(failures)
    return dict(got)

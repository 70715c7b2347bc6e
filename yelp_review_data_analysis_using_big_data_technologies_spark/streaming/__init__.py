"""Structured Streaming slice (SURVEY.md §2.10/§7.9).

The reference is strictly batch (run-to-completion Glue jobs,
main.tf:13-26); this layer is the engine's north-star extension for
the check-in/event-shaped data the reference names but never processes
(README.md:30).  Batch and streaming share the same DataFrame
transformations — a windowed aggregation is checked against the
identical batch SQL by the driver's oracle.
"""

from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.windows import (
    run_available_now,
    stream_events,
    tumbling_counts,
)

__all__ = ["run_available_now", "stream_events", "tumbling_counts"]

"""Streaming-slice tests (SURVEY.md §2.10): batch/stream unification,
availableNow replay determinism, and the append-mode watermark
semantics the batch oracle can't express (held-back trailing window,
late-data drop).
"""

import pytest
from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.streaming import (
    run_available_now,
    stream_events,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def batch_events(spark, smoke_dir):
    from yelp_review_data_analysis_using_big_data_technologies_spark.sources.readers import load_table

    return load_table(spark, smoke_dir, "events")


def test_stream_matches_batch(spark, smoke_dir, batch_events):
    """The same tumbling_counts body over stream vs batch input must
    produce identical rows — Structured Streaming's unified model."""
    streamed = run_available_now(
        tumbling_counts(stream_events(spark, smoke_dir)),
        "t_stream_vs_batch",
        "complete",
    )
    batch = tumbling_counts(batch_events)
    key = lambda r: (str(r.window_start), r.event_type)
    s = {key(r): (r.n, r.sum_value) for r in streamed.collect()}
    b = {key(r): (r.n, r.sum_value) for r in batch.collect()}
    assert s == b and len(s) > 0


def test_available_now_is_deterministic(spark, smoke_dir):
    a = run_available_now(
        tumbling_counts(stream_events(spark, smoke_dir)), "t_replay_a", "complete"
    ).collect()
    b = run_available_now(
        tumbling_counts(stream_events(spark, smoke_dir)), "t_replay_b", "complete"
    ).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_append_mode_holds_back_open_windows(spark, tmp_path):
    """Append mode only emits a window once the watermark passes its
    end: feeding one batch of data leaves the trailing window(s) open
    — the late-data policy in action."""
    src = tmp_path / "stream_src"
    src.mkdir()
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", "click", 1.0),
            (2, "2024-01-01 00:50:00", "click", 2.0),
            (3, "2024-01-01 03:00:00", "click", 4.0),  # advances watermark
        ],
        "event_id long, ts_str string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts_str"))
    df.select("event_id", "ts", "event_type", "value").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src))

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, event_type string, value double")
        .parquet(str(src))
    )
    out = run_available_now(
        tumbling_counts(stream, window="1 hour", watermark="30 minutes"),
        "t_append_watermark",
        "append",
    )
    emitted = {str(r.window_start): r.n for r in out.collect()}
    # watermark ends at 03:00 - 30min = 02:30 → the 00:00 window
    # (end 01:00 <= 02:30) emits; the 03:00 window stays open.
    assert emitted.get("2024-01-01 00:00:00") == 2
    assert "2024-01-01 03:00:00" not in emitted

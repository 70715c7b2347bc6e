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


def test_sliding_doubles_contributions(spark, smoke_dir, batch_events):
    """1h window / 30m slide: every event lands in exactly 2 windows,
    so total n across windows is 2x the event count; stream == batch."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.windows import sliding_counts

    streamed = run_available_now(
        sliding_counts(stream_events(spark, smoke_dir)),
        "t_sliding_stream",
        "complete",
    )
    batch = sliding_counts(batch_events)
    key = lambda r: (str(r.window_start), r.event_type)
    s = {key(r): (r.n, r.sum_value) for r in streamed.collect()}
    b = {key(r): (r.n, r.sum_value) for r in batch.collect()}
    assert s == b
    assert sum(n for n, _ in s.values()) == 2 * batch_events.count()


def test_dedup_within_watermark_suppresses_replays(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicate keys arriving within
    the watermark horizon are emitted once."""
    import datetime as dt

    from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.windows import dedup_within_watermark

    t0 = dt.datetime(2024, 1, 1, 12, 0)
    rows = [
        (1, t0, 1.0),
        (1, t0 + dt.timedelta(minutes=1), 1.0),  # replay of key 1
        (2, t0 + dt.timedelta(minutes=2), 2.0),
        (2, t0 + dt.timedelta(minutes=2), 2.0),  # exact dup of key 2
        (3, t0 + dt.timedelta(minutes=5), 3.0),
    ]
    src = str(tmp_path / "dup_events")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, value double"
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, value double"
    ).parquet(src)
    out = run_available_now(
        dedup_within_watermark(stream, ["event_id"], watermark="10 minutes"),
        "t_dedup_wm",
        "append",
    )
    got = sorted((r.event_id, r.value) for r in out.collect())
    assert got == [(1, 1.0), (2, 2.0), (3, 3.0)]


def test_checkpointed_file_sink_resumes_exactly_once(spark, tmp_path):
    """Two availableNow runs over a growing source with the same
    checkpoint must write each input row exactly once (offset log
    skips consumed files; commit log hides partial output)."""
    import datetime as dt

    from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.windows import stream_to_parquet

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1)
    first = [(i, t0, float(i)) for i in range(5)]
    spark.createDataFrame(
        first, "event_id long, ts timestamp, value double"
    ).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, value double"
        ).parquet(src)
        stream_to_parquet(stream, sink, ckpt)

    run_once()
    assert spark.read.parquet(sink).count() == 5

    second = [(i, t0, float(i)) for i in range(5, 8)]
    spark.createDataFrame(
        second, "event_id long, ts timestamp, value double"
    ).write.mode("append").parquet(src)
    run_once()
    got = sorted(r.event_id for r in spark.read.parquet(sink).collect())
    assert got == list(range(8))  # old rows not rewritten, new rows once


def test_streaming_sessionize_matches_batch(spark, smoke_dir, batch_events):
    """session_window sessionization over a stream (watermarked) must
    reproduce the batch result under availableNow replay."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.windows import sessionize

    streamed = run_available_now(
        sessionize(
            stream_events(spark, smoke_dir), gap="30 minutes",
            watermark="1 minute",
        ),
        "t_sessionize_stream",
        "append",
    )
    batch = sessionize(batch_events, gap="30 minutes")
    key = lambda r: (r.user_id, str(r.session_start))
    s = {key(r): (r.n_events, r.sum_value, r.last_ts) for r in streamed.collect()}
    b = {key(r): (r.n_events, r.sum_value, r.last_ts) for r in batch.collect()}
    # append mode holds back sessions the watermark hasn't passed; with
    # a 1-minute watermark over a finite replay everything closed
    # except possibly each user's last open session
    assert set(s) <= set(b)
    assert len(s) >= len(b) - batch.select("user_id").distinct().count()
    for k in s:
        assert s[k] == b[k]


def test_stream_stream_interval_join_matches_batch(spark, smoke_dir, batch_events):
    from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.joins import (
        stream_stream_interval_join,
    )

    def split(ev):
        clicks = ev.filter(F.col("event_type") == "click").select(
            "user_id",
            F.col("event_id").alias("c_event_id"),
            F.col("ts").alias("l_ts"),
        )
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("ts").alias("r_ts"), F.col("value").alias("p_value")
        )
        return clicks, purchases

    sc, sp = split(stream_events(spark, smoke_dir))
    streamed = run_available_now(
        stream_stream_interval_join(sc, sp), "ssj_test_sink", "append"
    )
    bc, bp = split(batch_events)
    batch = stream_stream_interval_join(bc, bp)
    key = lambda r: (r.user_id, r.c_event_id, r.r_ts)
    assert sorted(map(key, streamed.collect())) == sorted(map(key, batch.collect()))
    assert batch.count() > 0


def test_stream_merge_to_parquet_dedupes_across_batches(spark, tmp_path):
    """foreachBatch merge sink: the second run's batch REPLACES
    same-key rows instead of appending duplicates."""
    import datetime as dt

    from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.joins import (
        stream_merge_to_parquet,
    )

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(1, 1995, t0, "v1"), (2, 1996, t0, "v1")],
        "id long, y int, ts timestamp, payload string",
    ).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema(
            "id long, y int, ts timestamp, payload string"
        ).parquet(src)
        stream_merge_to_parquet(
            stream, table, ckpt, keys=["id"], partition_by=["y"]
        )

    run_once()
    # second wave: id=2 updated, id=3 new
    spark.createDataFrame(
        [(2, 1996, t0, "v2"), (3, 1996, t0, "v1")],
        "id long, y int, ts timestamp, payload string",
    ).write.mode("append").parquet(src)
    run_once()
    got = {(r.id, r.y): r.payload for r in spark.read.parquet(table).collect()}
    assert got == {(1, 1995): "v1", (2, 1996): "v2", (3, 1996): "v1"}


def test_max_files_per_trigger_bounds_micro_batches(spark, tmp_path):
    """Backpressure knob: ``maxFilesPerTrigger=1`` must split a 3-file
    backlog into 3 micro-batches (bounded per-batch state/memory — the
    catch-up-safely setting after downtime), and availableNow drains
    the whole backlog."""
    src = str(tmp_path / "rate_src")
    for i in range(3):
        spark.createDataFrame(
            [(i, float(i))], "k long, v double"
        ).coalesce(1).write.mode("append").parquet(src)

    seen = []

    def _count(batch_df, batch_id):
        seen.append((batch_id, batch_df.count()))

    q = (
        spark.readStream.schema("k long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(_count)
        .option("checkpointLocation", str(tmp_path / "rate_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(seen) == 3
    assert sum(n for _, n in seen) == 3


def test_stream_increment_counts_adds_partials_across_batches(spark, tmp_path):
    """Additive merge sink (incremental materialized view): each wave's
    per-key partial counts/sums ADD into the view; the final view
    equals the batch aggregate over all waves."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.joins import (
        stream_increment_counts_to_parquet,
    )

    src = str(tmp_path / "inc_src")
    table = str(tmp_path / "inc_table")
    ckpt = str(tmp_path / "inc_ckpt")
    spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0)], "k string, v double"
    ).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema("k string, v double").parquet(src)
        stream_increment_counts_to_parquet(
            stream, table, ckpt, keys=["k"], sum_col="s", sum_src="v"
        )

    run_once()
    spark.createDataFrame(
        [("a", 4.0), ("c", 100.0)], "k string, v double"
    ).write.mode("append").parquet(src)
    run_once()
    got = {r.k: (r.n, r.s) for r in spark.read.parquet(table).collect()}
    assert got == {"a": (3, 7.0), "b": (1, 10.0), "c": (1, 100.0)}


def test_stream_increment_counts_partition_pruned_rewrite(spark, tmp_path):
    """Partitioned additive merge: a batch that touches ONE partition
    must leave sibling partitions' files byte-untouched (pruned read +
    dynamic overwrite of only the touched directories), while the view
    still converges to the batch aggregate."""
    import glob
    import os

    from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.joins import (
        stream_increment_counts_to_parquet,
    )

    src = str(tmp_path / "pinc_src")
    table = str(tmp_path / "pinc_table")
    ckpt = str(tmp_path / "pinc_ckpt")
    spark.createDataFrame(
        [(1995, "a", 1.0), (1995, "a", 2.0), (1996, "b", 10.0)],
        "y int, k string, v double",
    ).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema("y int, k string, v double").parquet(src)
        stream_increment_counts_to_parquet(
            stream,
            table,
            ckpt,
            keys=["y", "k"],
            sum_col="s",
            sum_src="v",
            partition_by=["y"],
        )

    run_once()

    def snapshot(year: int) -> dict[str, tuple[int, float]]:
        files = glob.glob(os.path.join(table, f"y={year}", "*.parquet"))
        return {
            f: (os.path.getsize(f), os.path.getmtime(f)) for f in files
        }

    before_95, before_96 = snapshot(1995), snapshot(1996)
    assert before_95 and before_96
    # second wave touches ONLY y=1996
    spark.createDataFrame(
        [(1996, "b", 5.0), (1996, "c", 100.0)], "y int, k string, v double"
    ).write.mode("append").parquet(src)
    run_once()
    # untouched partition: identical file set, sizes, and mtimes
    assert snapshot(1995) == before_95
    # touched partition: rewritten
    assert snapshot(1996) != before_96
    got = {
        (r.y, r.k): (r.n, r.s) for r in spark.read.parquet(table).collect()
    }
    assert got == {
        (1995, "a"): (2, 3.0),
        (1996, "b"): (2, 15.0),
        (1996, "c"): (1, 100.0),
    }


def test_merge_sinks_distinguish_missing_from_unreadable():
    """Bootstrap-vs-broken: only path-missing / schema-inference
    failures may bootstrap; any other read failure must propagate so a
    crash-corrupted view is never silently reinitialized from one
    micro-batch."""
    from pyspark.errors import AnalysisException

    from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.joins import (
        _is_missing_table,
    )

    assert _is_missing_table(
        AnalysisException("[PATH_NOT_FOUND] Path does not exist: /x")
    )
    assert _is_missing_table(
        AnalysisException(
            "[UNABLE_TO_INFER_SCHEMA] Unable to infer schema for Parquet"
        )
    )
    assert not _is_missing_table(
        AnalysisException("[UNRESOLVED_COLUMN] A column cannot be resolved")
    )


def test_stream_vectors_to_ivf_index_incremental(spark, tmp_path, smoke_dir):
    """Streaming index maintenance: micro-batched vectors land in the
    persisted IVF index across runs; searches after each wave see
    everything ingested so far."""
    from pyspark.sql import functions as F

    from yelp_review_data_analysis_using_big_data_technologies_spark.llm import vectors as lvec
    from yelp_review_data_analysis_using_big_data_technologies_spark.sources.readers import load_table
    from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.joins import (
        stream_vectors_to_ivf_index,
    )

    emb = load_table(spark, smoke_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    base = emb.filter(F.col("vec_id") % 3 == 0)
    index = str(tmp_path / "index")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    lvec.build_ivf_index(base, index, n_cells=4)

    def run_once():
        stream = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).parquet(src)
        stream_vectors_to_ivf_index(stream, index, ckpt)

    wave1 = emb.filter(F.col("vec_id") % 3 == 1).limit(4)
    wave1.write.mode("append").parquet(src)
    run_once()
    stored = {r.vec_id for r in spark.read.parquet(f"{index}/cells").collect()}
    assert {r.vec_id for r in wave1.collect()} <= stored

    wave2 = emb.filter(F.col("vec_id") % 3 == 2).limit(4)
    wave2.write.mode("append").parquet(src)
    run_once()
    stored = {r.vec_id for r in spark.read.parquet(f"{index}/cells").collect()}
    assert {r.vec_id for r in wave2.collect()} <= stored
    assert {r.vec_id for r in base.collect()} <= stored

    # a streamed vector is its own nearest neighbor under full probe
    target = wave2.limit(1)
    q = target.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    hits = lvec.search_ivf_index(spark, index, q, k=1, n_probe=4).collect()
    assert hits and hits[0].vec_id == hits[0].query_id


@pytest.mark.parametrize("indexed", [False, True])
def test_stream_dedup_ingest_sequential_admission(spark, tmp_path, indexed):
    """Streaming dedup ingest: batch k must anti-join against the
    admitted corpus of ALL prior batches, in BOTH the recompute mode
    and the persisted band-key-index mode (which must admit the
    identical set).  Regression pin for the stale-cache bug: the
    banded staging persists fragments over the corpus path, and
    without a per-batch release Spark's cache manager substitutes
    batch k-1's file listing into batch k's corpus read — wave-2
    near-dups of wave-1 docs were silently admitted."""
    import glob
    import os
    import shutil

    from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.ingest import (
        stream_dedup_ingest_to_parquet,
    )

    T = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    T_NEAR = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    waves = [
        [(1, "one two three four five six seven", "en", 10)],
        # wave 1: intra-batch exact dup (21 dropped, 20 kept) + T
        [(2, T, "en", 10), (20, "same same same text here", "en", 9),
         (21, "same same same text here", "en", 9)],
        # wave 2: near-dup of wave-1's T (reject), exact dup of wave-0
        # (reject), genuinely new (admit)
        [(3, T_NEAR, "en", 10),
         (4, "one two three four five six seven", "en", 10),
         (5, "completely different content lives in this row", "en", 11)],
    ]
    src = str(tmp_path / "ing_src")
    table = str(tmp_path / "ing_table")
    ckpt = str(tmp_path / "ing_ckpt")
    os.makedirs(src)
    schema = "doc_id long, text string, lang string, n_chars long"
    for k, rows in enumerate(waves):
        stage = str(tmp_path / f"ing_stage{k}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        dst = os.path.join(src, f"wave{k}.parquet")
        shutil.move(glob.glob(os.path.join(stage, "part-*.parquet"))[0], dst)
        os.utime(dst, (1_000_000_000 + 1000 * k,) * 2)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_dedup_ingest_to_parquet(
        stream,
        table,
        ckpt,
        index_path=str(tmp_path / "ing_index") if indexed else None,
    )
    got = {
        r.doc_id: r.ingest_batch
        for r in spark.read.parquet(table).collect()
    }
    assert got == {1: 0, 2: 1, 20: 1, 5: 2}
    if indexed:
        idx = spark.read.parquet(str(tmp_path / "ing_index"))
        assert sorted(r.doc_id for r in idx.collect()) == [1, 2, 5, 20]


@pytest.mark.parametrize("indexed", [False, True])
def test_stream_dedup_ingest_replay_ignores_own_partition(
    spark, tmp_path, indexed
):
    """Crash-replay pin: a crash between batch k's partition write and
    its checkpoint commit leaves table/<batch>=k on disk.  The replay
    must NOT read that partition back as corpus — docs would reject as
    exact SELF-duplicates and the partition would be overwritten
    empty (silent loss).  Simulated by pre-seeding the batch-2
    partition (and index partition) with the crashed attempt's output
    before the stream runs."""
    import glob
    import os
    import shutil

    from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.ingest import (
        stream_dedup_ingest_to_parquet,
    )

    schema = "doc_id long, text string, lang string, n_chars long"
    waves = [
        [(1, "one two three four five six seven", "en", 10)],
        [(2, "alpha beta gamma delta epsilon zeta", "en", 10)],
        [(5, "completely different content lives in this row", "en", 11)],
    ]
    src = str(tmp_path / "rp_src")
    table = str(tmp_path / "rp_table")
    ckpt = str(tmp_path / "rp_ckpt")
    index = str(tmp_path / "rp_index")
    os.makedirs(src)
    for k, rows in enumerate(waves):
        stage = str(tmp_path / f"rp_stage{k}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        dst = os.path.join(src, f"wave{k}.parquet")
        shutil.move(glob.glob(os.path.join(stage, "part-*.parquet"))[0], dst)
        os.utime(dst, (1_000_000_000 + 1000 * k,) * 2)
    # crashed batch-2 attempt: its own admitted output already on disk
    spark.createDataFrame(waves[2], schema).write.mode("overwrite").parquet(
        f"{table}/ingest_batch=2"
    )
    if indexed:
        # ...and, in indexed mode, its features too
        from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.ingest import (
            _delta_features,
        )

        _delta_features(
            spark.createDataFrame(waves[2], schema),
            "doc_id", "text", 6, 3, 3,
        ).write.mode("overwrite").parquet(f"{index}/ingest_batch=2")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_dedup_ingest_to_parquet(
        stream, table, ckpt, index_path=index if indexed else None
    )
    got = {
        r.doc_id: r.ingest_batch
        for r in spark.read.parquet(table).collect()
    }
    assert got == {1: 0, 2: 1, 5: 2}  # doc 5 survives the replay


def _stage_doc_waves(spark, tmp_path, waves, prefix):
    """One single-file parquet wave per list, mtime-ordered."""
    import glob
    import os
    import shutil

    src = str(tmp_path / f"{prefix}_src")
    os.makedirs(src)
    schema = "doc_id long, text string, lang string, n_chars long"
    for k, rows in enumerate(waves):
        stage = str(tmp_path / f"{prefix}_stage{k}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        dst = os.path.join(src, f"wave{k}.parquet")
        shutil.move(glob.glob(os.path.join(stage, "part-*.parquet"))[0], dst)
        os.utime(dst, (1_000_000_000 + 1000 * k,) * 2)
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


# chain fixture for the keep-first-over-all-seen semantics: B is a
# near-dup of A (J=0.778), C is a near-dup of B (J=0.6) but NOT of A
# (J=0.455 < 0.5) — band collisions verified deterministic for the
# salted-md5 MinHash at the default 6 hashes / 3 bands
_DOC_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
_DOC_B = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
_DOC_C = "mu nu gamma delta epsilon zeta eta theta iota lambda"


def test_stream_doc_dedup_rejected_doc_vetoes_later_dups(spark, tmp_path):
    """THE contract that distinguishes global keep-first from
    admitted-corpus admission: wave-1's B is rejected (near-dup of
    wave-0's A), and wave-2's C — a near-dup of the REJECTED B but not
    of A — must still be rejected, because every SEEN doc vetoes.
    (stream_dedup_ingest would admit C.)  Also pins intra-batch
    keep-first: an exact dup inside one wave keeps the min-id copy,
    and a NULL-text doc is exempt from the exact check."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.ingest import (
        stream_doc_dedup_to_parquet,
    )

    waves = [
        [(1, _DOC_A, "en", 10), (10, None, "en", 0), (11, None, "en", 0)],
        [(2, _DOC_B, "en", 10),
         (20, "same same same text here", "en", 9),
         (21, "same same same text here", "en", 9)],
        [(3, _DOC_C, "en", 10),
         (5, "completely different content lives in this row", "en", 11)],
    ]
    stream = _stage_doc_waves(spark, tmp_path, waves, "gkf")
    table = str(tmp_path / "gkf_table")
    stream_doc_dedup_to_parquet(
        stream, table, str(tmp_path / "gkf_ckpt"), str(tmp_path / "gkf_idx")
    )
    got = {
        r.doc_id: r.ingest_batch
        for r in spark.read.parquet(table).collect()
    }
    # 1=A admitted; 10,11 NULL-text both admitted (exact-check exempt);
    # 20 keeps min-id of the intra-wave exact pair; B(2), C(3) rejected
    assert got == {1: 0, 10: 0, 11: 0, 20: 1, 5: 2}
    # the index remembers EVERY seen doc, rejected ones included
    idx = spark.read.parquet(str(tmp_path / "gkf_idx"))
    assert sorted(r.doc_id for r in idx.collect()) == [1, 2, 3, 5, 10, 11, 20, 21]


def test_stream_doc_dedup_equals_global_batch(spark, tmp_path):
    """Associativity pin: the accumulated streaming result equals the
    one-shot GLOBAL keep-first over all docs at once — first occurrence
    of each content hash, minus every id_b of the full banded pair
    relation."""
    from pyspark.sql import Window

    from yelp_review_data_analysis_using_big_data_technologies_spark.llm.dedup import near_dup_pairs_banded
    from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import release_staging
    from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.ingest import (
        stream_doc_dedup_to_parquet,
    )

    waves = [
        [(1, _DOC_A, "en", 10), (4, "one two three four five six seven", "en", 10)],
        [(2, _DOC_B, "en", 10), (6, "one two three four five six seven", "en", 10)],
        [(3, _DOC_C, "en", 10),
         (5, "completely different content lives in this row", "en", 11)],
    ]
    stream = _stage_doc_waves(spark, tmp_path, waves, "assoc")
    table = str(tmp_path / "assoc_table")
    stream_doc_dedup_to_parquet(
        stream, table, str(tmp_path / "assoc_ckpt"), str(tmp_path / "assoc_idx")
    )
    streamed = sorted(
        r.doc_id for r in spark.read.parquet(table).collect()
    )
    all_rows = [r for w in waves for r in w]
    df = spark.createDataFrame(
        all_rows, "doc_id long, text string, lang string, n_chars long"
    )
    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    exact_first = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("text").isNull() | (F.col("__rn") == 1))
        .select("doc_id")
    )
    dropped = near_dup_pairs_banded(df, threshold=0.5).select(
        F.col("id_b").alias("doc_id")
    )
    release_staging()
    want = sorted(
        r.doc_id
        for r in exact_first.join(dropped, "doc_id", "left_anti").collect()
    )
    assert streamed == want == [1, 4, 5]


def test_stream_doc_dedup_replay_ignores_own_partition(spark, tmp_path):
    """Crash-replay pin (same construction as the admission ingest):
    a crashed batch-2 attempt leaves BOTH its corpus partition and its
    all-seen index partition on disk; the replay must not read either
    back (its own index features would reject every doc as an exact
    self-duplicate) — doc 5 survives."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.ingest import (
        _delta_features,
        stream_doc_dedup_to_parquet,
    )

    waves = [
        [(1, "one two three four five six seven", "en", 10)],
        [(2, "alpha beta gamma delta epsilon zeta", "en", 10)],
        [(5, "completely different content lives in this row", "en", 11)],
    ]
    table = str(tmp_path / "dr_table")
    index = str(tmp_path / "dr_index")
    schema = "doc_id long, text string, lang string, n_chars long"
    spark.createDataFrame(waves[2], schema).write.mode("overwrite").parquet(
        f"{table}/ingest_batch=2"
    )
    _delta_features(
        spark.createDataFrame(waves[2], schema), "doc_id", "text", 6, 3, 3
    ).write.mode("overwrite").parquet(f"{index}/ingest_batch=2")
    stream = _stage_doc_waves(spark, tmp_path, waves, "dr")
    stream_doc_dedup_to_parquet(
        stream, table, str(tmp_path / "dr_ckpt"), index
    )
    got = {
        r.doc_id: r.ingest_batch
        for r in spark.read.parquet(table).collect()
    }
    assert got == {1: 0, 2: 1, 5: 2}


def test_stream_increment_counts_partial_commit_replay(spark, tmp_path):
    """Per-partition replay watermark: if a crash mid-commit leaves one
    touched partition committed and another not, the replayed batch
    must re-merge ONLY the uncommitted partition — a global
    max(__max_batch_id) skip would drop its partials forever.
    Simulated by deleting one partition's directory after a clean run
    (as if its overwrite never committed) and forcing a full replay
    via a fresh checkpoint."""
    import shutil

    from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.joins import (
        stream_increment_counts_to_parquet,
    )

    src = str(tmp_path / "pc_src")
    table = str(tmp_path / "pc_table")
    spark.createDataFrame(
        [("a", 1, 1.0), ("a", 1, 2.0), ("b", 2, 10.0)],
        "k string, d int, v double",
    ).write.mode("append").parquet(src)

    def run(ckpt):
        stream = spark.readStream.schema("k string, d int, v double").parquet(
            src
        )
        stream_increment_counts_to_parquet(
            stream, table, ckpt,
            keys=["k", "d"], sum_col="s", sum_src="v",
            partition_by=["d"],
        )

    run(str(tmp_path / "pc_ckpt1"))
    # crash simulation: partition d=2's overwrite never committed
    shutil.rmtree(f"{table}/d=2")
    # full replay of batch 0 (fresh checkpoint)
    run(str(tmp_path / "pc_ckpt2"))
    got = {(r.k, r.d): (r.n, r.s) for r in spark.read.parquet(table).collect()}
    # d=1 untouched by the replay (not double-added); d=2 restored
    assert got == {("a", 1): (2, 3.0), ("b", 2): (1, 10.0)}


def test_stream_increment_counts_numeric_shaped_string_partition(spark, tmp_path):
    """Replay skip under a string partition key with NUMERIC shape
    (r5 ADVICE): "01" round-trips through the directory name as
    inferred int 1, so the raw tuple compare never matched the 'done'
    set — a replayed batch double-added its partials and the rewrite
    landed in a second directory (d=1 beside d=01).  The sink now
    reads the view with partition-type inference off and casts to the
    batch frame's own dtypes."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.joins import (
        stream_increment_counts_to_parquet,
    )

    src = str(tmp_path / "ns_src")
    table = str(tmp_path / "ns_table")
    spark.createDataFrame(
        [("a", "01", 1.0), ("a", "01", 2.0), ("b", "2", 10.0)],
        "k string, d string, v double",
    ).write.mode("append").parquet(src)

    def run(ckpt):
        stream = spark.readStream.schema("k string, d string, v double").parquet(src)
        stream_increment_counts_to_parquet(
            stream, table, ckpt,
            keys=["k", "d"], sum_col="s", sum_src="v",
            partition_by=["d"],
        )

    run(str(tmp_path / "ns_ckpt1"))
    # full replay of batch 0 (fresh checkpoint): every partition is
    # already committed, so the replay must be a complete no-op
    run(str(tmp_path / "ns_ckpt2"))
    import glob as _glob
    dirs = sorted(
        p.rsplit("/", 1)[1]
        for p in _glob.glob(f"{table}/d=*")
    )
    assert dirs == ["d=01", "d=2"], dirs  # no stray d=1 directory
    # read back with inference off so d keeps its written string form
    prev = spark.conf.get(
        "spark.sql.sources.partitionColumnTypeInference.enabled", "true"
    )
    spark.conf.set(
        "spark.sql.sources.partitionColumnTypeInference.enabled", "false"
    )
    try:
        got = {
            (r.k, r.d): (r.n, r.s)
            for r in spark.read.parquet(table).collect()
        }
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionColumnTypeInference.enabled", prev
        )
    assert got == {("a", "01"): (2, 3.0), ("b", "2"): (1, 10.0)}


def test_stream_dedup_ingest_mode_migration_backfills_index(spark, tmp_path):
    """Switching a recompute-mode stream to index_path= must NOT admit
    duplicates of the pre-switch corpus: corpus-exists-but-index-
    missing triggers a one-time feature backfill (previously the
    missing index read as bootstrap and the old corpus stayed
    invisible to dedup forever)."""
    import glob
    import os
    import shutil

    from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.ingest import (
        stream_dedup_ingest_to_parquet,
    )

    base = str(tmp_path)
    src = f"{base}/src"
    os.makedirs(src)

    def _wave(rows, name, mtime):
        stage = f"{base}/stage_{name}"
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(stage)
        dst = f"{src}/{name}.parquet"
        shutil.move(glob.glob(f"{stage}/part-*.parquet")[0], dst)
        os.utime(dst, (mtime, mtime))

    _wave(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "w0",
        1_000_000_000,
    )

    def _run(ckpt, **kw):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream_dedup_ingest_to_parquet(
            stream, f"{base}/corpus", ckpt, **kw
        )

    # phase 1: recompute mode builds the corpus, NO index
    _run(f"{base}/ckpt")
    assert not os.path.exists(f"{base}/index")

    # phase 2: same checkpoint, indexed mode; the new wave holds one
    # exact duplicate of the pre-switch corpus and one new doc
    _wave(
        [(10, "alpha beta gamma delta"), (11, "iota kappa lambda mu")],
        "w1",
        1_000_001_000,
    )
    _run(f"{base}/ckpt", index_path=f"{base}/index")

    got = sorted(
        r.doc_id for r in spark.read.parquet(f"{base}/corpus").collect()
    )
    assert got == [1, 2, 11], got  # 10 rejected against the OLD corpus
    # the backfilled index covers the pre-switch docs
    idx_ids = sorted(
        r.doc_id for r in spark.read.parquet(f"{base}/index").collect()
    )
    assert set([1, 2]) <= set(idx_ids), idx_ids


def test_stream_line_dedup_sequential_lines(spark, tmp_path):
    """Streaming line dedup: a long line admitted in an earlier batch
    must drop from every later batch's documents (while short lines
    and fresh lines survive), within-batch duplicates keep their
    first (id, pos) copy, and documents reassemble in order."""
    import glob
    import os
    import shutil

    from yelp_review_data_analysis_using_big_data_technologies_spark.streaming.ingest import (
        stream_line_dedup_to_parquet,
    )

    boiler = "this exact boilerplate navigation line repeats everywhere"
    fresh = "a genuinely new long line that nobody wrote before this"
    waves = [
        [(1, f"intro\n{boiler}\nbody one")],
        # wave 1: boiler seen in wave 0 -> drops; intra-batch dup of
        # `fresh` between docs 2 and 3 -> doc 2 (lower id) keeps it
        [(2, f"{fresh}\nshort"), (3, f"also\n{fresh}")],
        [(4, f"{boiler}\n{fresh}\nclosing words")],
    ]
    src = str(tmp_path / "ld_src")
    table = str(tmp_path / "ld_table")
    ckpt = str(tmp_path / "ld_ckpt")
    os.makedirs(src)
    schema = "doc_id long, text string"
    for k, rows in enumerate(waves):
        stage = str(tmp_path / f"ld_stage{k}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        dst = os.path.join(src, f"wave{k}.parquet")
        shutil.move(glob.glob(os.path.join(stage, "part-*.parquet"))[0], dst)
        os.utime(dst, (1_000_000_000 + 1000 * k,) * 2)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_line_dedup_to_parquet(stream, table, ckpt)
    got = {r.doc_id: r for r in spark.read.parquet(table).collect()}
    assert got[1].clean_text == f"intro\n{boiler}\nbody one"
    assert got[1].ingest_batch == 0 and got[1].n_removed == 0
    assert got[2].clean_text == f"{fresh}\nshort"
    assert got[3].clean_text == "also" and got[3].n_removed == 1
    assert got[4].clean_text == "closing words" and got[4].n_removed == 2

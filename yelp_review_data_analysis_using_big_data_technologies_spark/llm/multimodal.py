"""Multimodal column plumbing (SURVEY.md §2.12).

Images/audio/video ride through the engine as opaque ``binary``
columns plus a typed metadata struct; all per-item work (decode,
feature extraction, resizing, frame sampling) runs as Arrow-batched
``mapInPandas`` — the ONLY place Python touches rows, and it touches
them a columnar batch at a time, partition-parallel.

The actual codec calls are stubbed (image/audio libraries are not
available in this environment): ``decode=`` selects either
``"fake"`` — a deterministic, content-derived stand-in used by tests
and the driver's correctness check — or ``"real"``, which raises
``NotImplementedError`` at the decode site with the library contract
documented.  Everything AROUND the decode — schema, batch iteration,
partitioning, output contract — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried beside every media blob.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),  # png, wav, mp4, ...
        T.StructField("source_uri", T.StringType()),
    ]
)

#: Canonical multimodal record: id + opaque payload + metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
    ]
)

#: Output of the feature-extraction pass.
MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: derives (width, height,
    n_frames) purely from the byte length so Spark and the SQL oracle
    can agree on the result."""
    n = len(payload)
    return (n % 64 + 1, n // 64 + 1, n % 16 + 1)


def extract_features(
    media: DataFrame, decode: str = "fake", batch_hint: int = 1024
) -> DataFrame:
    """Decode + feature-extract every media item.

    ``mapInPandas`` streams Arrow batches through one Python worker per
    partition — per-batch overhead, not per-row; the output schema is
    declared up front so downstream plans stay fully typed.  The
    decode itself is the stub described in the module docstring.
    """
    if decode not in ("fake", "real"):
        raise ValueError(f"decode must be 'fake' or 'real', got {decode!r}")

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                # Library contract: Pillow for image (Image.open →
                # .size), soundfile for audio (frames/samplerate),
                # pyav for video (stream dims + frame count).
                raise NotImplementedError(
                    "real decoders require image/audio codec libraries; "
                    "install and replace _fake_decode per media_type"
                )
            feats = [_fake_decode(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(_batches, schema=MEDIA_FEATURES_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter used by tests and the driver check: dress the synthetic
    ``documents`` table as a media table (utf-8 payload bytes + fake
    metadata) so the multimodal plumbing is exercised end-to-end
    without a binary fixture."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            F.concat(F.lit("synthetic://"), F.col("source")).alias("source_uri"),
        ).alias("meta"),
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize pass-through: REAL pipelines re-encode payloads here via
    the same mapInPandas shape as :func:`extract_features`; the stub
    records the target dims in metadata and leaves bytes untouched so
    plan shape/testing stay honest about the data volume moved."""
    return media.withColumn(
        "meta",
        F.struct(
            F.col("meta.media_type"),
            F.col("meta.format"),
            F.col("meta.source_uri"),
        ),
    ).withColumn("target_dims", F.array(F.lit(width), F.lit(height)))

"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container image has no codec libraries, so the decode kernels are
STUBS: ``decode_stub=True`` (default) produces deterministic fake outputs
with the REAL Spark-side plumbing — schema, Arrow batch shapes,
``mapInPandas`` signatures, partitioning — all exercised and tested.
Swapping in a real decoder (PIL/librosa/pyav) changes only the marked
inner functions, nothing in the plan.

Scale design: media bytes stay in executor-side Arrow batches end to end
(never collected); per-batch work is vectorized over pandas; feature
outputs are fixed-width columns so downstream joins/aggregations shuffle
features, not media. Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — set it low (e.g. 64)
for video-sized blobs so a batch stays under executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, content_hash string, "
    "width int, height int, mean_luma double, feature array<float>"
)

AUDIO_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, content_hash string, "
    "duration_ms int, sample_rate int, rms double, feature array<float>"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_bytes binary, frame_hash string"


def _fake_embedding(seed_bytes: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature vector derived from content bytes.
    REPLACE with a real model forward pass when codecs are available."""
    import hashlib

    h = hashlib.md5(seed_bytes or b"").digest()
    return [((h[i % 16] / 255.0) * 2 - 1) for i in range(dim)]


def extract_image_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Image decode + feature extraction over Arrow batches.

    With ``decode_stub`` the decoded dimensions come from the metadata
    struct and the luma/embedding from a content-hash-derived fake; the
    batch iteration, schema, and partition behavior are production-real.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not decode_stub:  # pragma: no cover
                raise NotImplementedError(
                    "real image decoding requires PIL/opencv — not in this container"
                )
            content = pdf["content"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "content_hash": content.map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "width": pdf["meta"].map(lambda m: m["width"] if m else None),
                    "height": pdf["meta"].map(lambda m: m["height"] if m else None),
                    "mean_luma": content.map(
                        lambda b: (sum(b[:64]) / max(min(len(b), 64), 1)) / 255.0
                        if b
                        else 0.0
                    ),
                    "feature": content.map(_fake_embedding),
                }
            )
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(op, IMAGE_FEATURES_SCHEMA)


def extract_audio_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Audio decode + RMS/feature extraction (stubbed decode, real plumbing)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not decode_stub:  # pragma: no cover
                raise NotImplementedError(
                    "real audio decoding requires librosa/soundfile — not in this container"
                )
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "content_hash": content.map(lambda b: hashlib.md5(b or b"").hexdigest()),
                    "duration_ms": pdf["meta"].map(lambda m: m["duration_ms"] if m else None),
                    "sample_rate": pdf["meta"].map(lambda m: m["sample_rate"] if m else None),
                    "rms": content.map(
                        lambda b: (sum(x * x for x in b[:64]) / max(min(len(b), 64), 1)) ** 0.5
                        / 255.0
                        if b
                        else 0.0
                    ),
                    "feature": content.map(_fake_embedding),
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(op, AUDIO_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 2, max_frames: int = 4,
                  decode_stub: bool = True) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (row
    explosion happens executor-side inside the Arrow batch, so a video
    never rides the shuffle whole)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not decode_stub:  # pragma: no cover
                raise NotImplementedError("real frame decode requires pyav/ffmpeg")
            rows = []
            for _, r in pdf.iterrows():
                b = r["content"] or b""
                # stub: treat each 64-byte slice as one "frame"
                n = max(len(b) // 64, 1)
                for fi in range(0, min(n, max_frames * every_n), every_n):
                    fb = bytes(b[fi * 64 : (fi + 1) * 64])
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": fi,
                            "frame_bytes": fb,
                            "frame_hash": hashlib.md5(fb).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_bytes", "frame_hash"]
            )

    return media.filter(F.col("kind") == "video").mapInPandas(op, FRAME_SAMPLE_SCHEMA)


def synthetic_media(spark, n: int = 32, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/demos (round-trip fixture
    for the M1 contract: binary + struct metadata columns)."""
    import random

    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        blob = bytes(rng.randrange(256) for _ in range(128 + (i % 5) * 64))
        rows.append(
            (
                i,
                kind,
                blob,
                {
                    "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                    "width": 64 + i if kind == "image" else None,
                    "height": 48 + i if kind == "image" else None,
                    "duration_ms": 1000 * (i + 1) if kind != "image" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)

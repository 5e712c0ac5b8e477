"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata.

The container has no image/audio libraries, so the decode kernels are
deterministic fakes clearly marked as stubs — but the Spark-side plumbing
is real and tested: schemas, Arrow batch shapes, mapInPandas signatures,
and partition sizing are exactly what a real decoder would plug into
(swap `_fake_decode_image` for PIL/torchvision and nothing else changes).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def _fake_decode_image(payload: bytes, dim: int = 16) -> np.ndarray:
    """STUB — stands in for a real image decode + embed. Deterministic:
    derives a feature vector from the payload's sha256. Replace with a real
    decoder (PIL -> resize -> model) in production; the Spark plumbing
    around it is unchanged. Availability re-checked per round (last:
    2026-08-18, round 6): PIL / torchvision / soundfile / librosa / cv2 /
    imageio / av all absent from this sandbox and there is no network to
    install them, so the stub stands."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """media(MEDIA_SCHEMA) -> (media_id, feature float[dim], n_bytes).

    mapInPandas keeps whole Arrow batches of binary payloads off the
    Python heap until the decode call; with real decoders set
    spark.sql.execution.arrow.maxRecordsPerBatch so batch_size x max
    payload fits executor memory."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode_image(p, dim).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts_ms).
    The decode itself is stubbed; the explode/plan shape is the real
    distributed pattern (rows stay bounded by duration/every_ms)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def decode_audio(payload: bytes):  # pragma: no cover - explicit stub
    raise NotImplementedError(
        "audio decode requires libs not present in this container; "
        "plug a decoder into extract_features' mapInPandas instead"
    )

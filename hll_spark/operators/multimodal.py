"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery is real and tested — typed metadata schema,
Arrow batch shapes, mapInPandas partitioning, deterministic fake
feature extraction — while the actual media decoding is STUBBED: the
image/audio codec libraries are not available in this environment, so
``decode_media`` raises ``NotImplementedError`` unless the caller opts
into the deterministic fake decoder (used by tests and the synthetic
pipeline). Swapping in a real decoder is a one-function change; nothing
in the distributed plan changes.

Design for 100 TB: media bytes never leave their partition — features
are extracted in-place per Arrow batch (mapInPandas), and only the small
typed feature vectors / metadata rows shuffle.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("format", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_sha256", StringType()),
    ]
)

FEATURE_DIM = 64

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def decode_media(payload: bytes, kind: str):
    """Decode raw media bytes into pixels/samples/frames.

    STUB: real decoding requires codec libraries (PIL/ffmpeg/...) that are
    not present in this environment. The distributed plumbing around this
    function is real; swap this body for a real decoder in production.
    """
    raise NotImplementedError(
        "media decoding requires codec libraries not available here; "
        "use fake_decode for deterministic testing"
    )


def fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in decoder: expands content bytes into a fixed
    pseudo-signal (sha256-seeded), so the downstream feature pipeline has
    stable, content-dependent inputs to exercise batching and schemas."""
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(256)


def _extract_features(signal: np.ndarray) -> np.ndarray:
    """Toy feature extractor: banded second-moment summary (content-
    deterministic, fixed FEATURE_DIM output)."""
    bands = signal.reshape(FEATURE_DIM, -1)
    return np.sqrt((bands**2).mean(axis=1))


def media_metadata(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Typed metadata for a binary media column — fully JVM-side."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.col("kind"),
        F.col("format"),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("content_sha256"),
    )


def extract_media_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decoder=fake_decode,
) -> DataFrame:
    """mapInPandas feature extraction; media bytes never shuffle.

    ``decoder`` defaults to the deterministic fake; pass
    :func:`decode_media` (or a real implementation) in production.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = []
            for payload, kind in zip(pdf[payload_col], pdf["kind"]):
                signal = decoder(bytes(payload), kind)
                feats.append(_extract_features(signal).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(np.int64),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": pdf[payload_col].map(len).to_numpy(np.int64),
                    "feature": feats,
                }
            )

    return df.select(id_col, "kind", payload_col).mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_n: int = 10,
) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_no) rows for
    every ``every_n``-th frame. Frame *count* here derives from payload
    size (decoder stubbed); the explode/shuffle shape is the real one."""
    n_frames = (F.length(F.col(payload_col)) / 1024).cast("long") + 1
    return df.select(
        F.col(id_col).alias("media_id"),
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias(
            "frame_no"
        ),
    )

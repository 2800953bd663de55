"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery is real and tested — typed metadata schema,
Arrow batch shapes, mapInPandas partitioning, deterministic fake
feature extraction — and container-HEADER parsing
(:func:`parse_media_headers`) is REAL — PNG/JPEG/GIF/BMP/WAV
dimensions, sample rate and duration read straight from the published
byte layouts, no codec library needed. Only pixel/sample DECODING is
stubbed: ``decode_media`` raises ``NotImplementedError`` unless the
caller opts into the deterministic fake decoder (used by tests and the
synthetic pipeline). Swapping in a real decoder is a one-function
change; nothing in the distributed plan changes.

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


HEADER_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_channels", LongType()),
        StructField("duration_ms", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def parse_header(b: bytes) -> dict:
    """REAL container-header parsing — no codec library needed.

    Reads dimensions / audio params straight from the published byte
    layouts: PNG IHDR, JPEG SOF0/1/2 markers, GIF logical screen
    descriptor, BMP info header, WAV RIFF fmt+data chunks. Anything
    else is 'unknown'. (Pixel/sample DECODING stays stubbed in
    :func:`decode_media` — that genuinely needs codecs; header parsing
    does not.)
    """
    out = {
        "format": "unknown", "width": None, "height": None,
        "sample_rate": None, "n_channels": None, "duration_ms": None,
    }
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
            out["format"] = "png"
            out["width"] = int.from_bytes(b[16:20], "big")
            out["height"] = int.from_bytes(b[20:24], "big")
        elif b[:3] == b"GIF" and b[3:6] in (b"87a", b"89a"):
            out["format"] = "gif"
            out["width"] = int.from_bytes(b[6:8], "little")
            out["height"] = int.from_bytes(b[8:10], "little")
        elif b[:2] == b"BM" and len(b) >= 26:
            out["format"] = "bmp"
            out["width"] = int.from_bytes(b[18:22], "little", signed=True)
            out["height"] = abs(int.from_bytes(b[22:26], "little", signed=True))
        elif b[:2] == b"\xff\xd8":
            out["format"] = "jpeg"
            i = 2
            while i + 9 < len(b) and b[i] == 0xFF:
                marker, seglen = b[i + 1], int.from_bytes(b[i + 2 : i + 4], "big")
                if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                    out["height"] = int.from_bytes(b[i + 5 : i + 7], "big")
                    out["width"] = int.from_bytes(b[i + 7 : i + 9], "big")
                    break
                i += 2 + seglen
        elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            out["format"] = "wav"
            i = 12
            rate = channels = block_align = None
            data_len = None
            while i + 8 <= len(b):
                cid = b[i : i + 4]
                clen = int.from_bytes(b[i + 4 : i + 8], "little")
                if cid == b"fmt ":
                    channels = int.from_bytes(b[i + 10 : i + 12], "little")
                    rate = int.from_bytes(b[i + 12 : i + 16], "little")
                    block_align = int.from_bytes(b[i + 20 : i + 22], "little")
                elif cid == b"data":
                    data_len = clen
                i += 8 + clen + (clen & 1)
            out["sample_rate"], out["n_channels"] = rate, channels
            if rate and block_align and data_len is not None:
                out["duration_ms"] = data_len * 1000 // (rate * block_align)
    except (IndexError, ValueError):
        pass  # malformed header: stay 'unknown' / partial
    return out


def parse_media_headers(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """(media_id, format, width, height, sample_rate, n_channels,
    duration_ms, n_bytes) via in-place header parsing — bytes never
    shuffle, only the small typed rows do."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = [parse_header(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(rows)
            out.insert(0, "media_id", pdf[id_col].to_numpy(np.int64))
            out["n_bytes"] = pdf[payload_col].map(len).to_numpy(np.int64)
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, HEADER_SCHEMA)


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

"""Multimodal plumbing tests: schema, batching, deterministic fake decode."""

import numpy as np
import pandas as pd
import pytest

from hll_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_media_features,
    fake_decode,
    frame_sample_plan,
    media_metadata,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rng = np.random.default_rng(0)
    pdf = pd.DataFrame(
        {
            "media_id": range(20),
            "kind": ["image", "audio", "video", "image"] * 5,
            "format": ["png", "wav", "mp4", "jpg"] * 5,
            "payload": [bytes(rng.integers(0, 256, size=2048 + 512 * i, dtype=np.uint8)) for i in range(20)],
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG...", "image")


def test_fake_decode_deterministic():
    a = fake_decode(b"hello", "image")
    b = fake_decode(b"hello", "image")
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, fake_decode(b"other", "image"))


def test_metadata_schema(spark, media_df):
    df, pdf = media_df
    meta = media_metadata(df).toPandas()
    assert list(meta.columns) == [
        "media_id",
        "kind",
        "format",
        "n_bytes",
        "content_sha256",
    ]
    assert (meta.sort_values("media_id")["n_bytes"].to_numpy()
            == pdf.sort_values("media_id")["payload"].map(len).to_numpy()).all()


def test_feature_extraction_shape_and_determinism(spark, media_df):
    df, pdf = media_df
    feats = extract_media_features(df.repartition(4)).toPandas()
    assert len(feats) == 20
    assert all(len(f) == FEATURE_DIM for f in feats["feature"])
    again = extract_media_features(df.repartition(2)).toPandas()
    a = feats.sort_values("media_id").reset_index(drop=True)
    b = again.sort_values("media_id").reset_index(drop=True)
    for x, y in zip(a["feature"], b["feature"]):
        np.testing.assert_allclose(x, y)


def test_frame_sample_plan(spark, media_df):
    df, pdf = media_df
    frames = frame_sample_plan(df, every_n=1).toPandas()
    counts = frames.groupby("media_id").size()
    expected = pdf.set_index("media_id")["payload"].map(
        lambda p: len(p) // 1024 + 1
    )
    for mid in pdf["media_id"]:
        assert counts[mid] == expected[mid]

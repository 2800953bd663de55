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


def _mini_png(w, h):
    import struct, zlib
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr)) + chunk
            + struct.pack(">I", zlib.crc32(chunk)))


def _mini_gif(w, h):
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 6


def _mini_bmp(w, h):
    hdr = bytearray(54)
    hdr[0:2] = b"BM"
    hdr[18:22] = w.to_bytes(4, "little")
    hdr[22:26] = h.to_bytes(4, "little", signed=False)
    return bytes(hdr)


def _mini_jpeg(w, h):
    import struct
    sof = struct.pack(">BBHBHHB", 0xFF, 0xC0, 11, 8, h, w, 3)
    return b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 4) + b"JF" + sof


def _mini_wav(rate, channels, n_samples, bits=16):
    import struct
    block = channels * bits // 8
    data = b"\x00" * (n_samples * block)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
           + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_parse_media_headers_real_formats(spark):
    from hll_spark.operators.multimodal import parse_media_headers

    payloads = [
        _mini_png(640, 480),
        _mini_gif(320, 200),
        _mini_bmp(100, 50),
        _mini_jpeg(1920, 1080),
        _mini_wav(16000, 2, 16000),  # 1s stereo
        b"not a media file at all",
    ]
    pdf = pd.DataFrame({"media_id": range(6), "payload": payloads})
    df = spark.createDataFrame(pdf)
    got = {r.media_id: r for r in parse_media_headers(df).collect()}
    assert (got[0].format, got[0].width, got[0].height) == ("png", 640, 480)
    assert (got[1].format, got[1].width, got[1].height) == ("gif", 320, 200)
    assert (got[2].format, got[2].width, got[2].height) == ("bmp", 100, 50)
    assert (got[3].format, got[3].width, got[3].height) == ("jpeg", 1920, 1080)
    assert (got[4].format, got[4].sample_rate, got[4].n_channels,
            got[4].duration_ms) == ("wav", 16000, 2, 1000)
    assert got[5].format == "unknown" and got[5].width is None
    assert all(got[i].n_bytes == len(payloads[i]) for i in range(6))


def test_png_roundtrip_all_filters_and_color_types():
    """Real PNG decode: the encoder rotates through all 5 filter types
    row-by-row, so a correct round-trip proves every unfilter branch
    (None/Sub/Up/Average/Paeth) for gray, gray+alpha, RGB and RGBA."""
    from hll_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    for shape in [(6, 8), (7, 5, 2), (6, 8, 3), (5, 7, 4), (1, 1), (2, 1, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        got = decode_png(encode_png(img))
        np.testing.assert_array_equal(got, img.squeeze() if img.ndim == 2 else img)


def test_wav_roundtrip_mono_and_stereo():
    from hll_spark.operators.multimodal import decode_wav, encode_wav

    mono = (np.arange(100) * 37 % 211 - 100).astype(np.int16)
    np.testing.assert_array_equal(decode_wav(encode_wav(mono)), mono)
    stereo = np.stack([mono, -mono], axis=1)
    np.testing.assert_array_equal(decode_wav(encode_wav(stereo)), stereo)


def test_decode_media_dispatch_and_header_consistency():
    """decode_media routes PNG/WAV to the real decoders; decoded shape
    agrees with the independent header parser; other formats still
    raise (honest stub for codec-dependent formats)."""
    from hll_spark.operators.multimodal import (
        decode_media,
        encode_png,
        encode_wav,
        parse_header,
    )

    img = (np.arange(48, dtype=np.uint8) % 251).reshape(6, 8)
    png = encode_png(img)
    hdr = parse_header(png)
    pixels = decode_media(png, "image")
    assert (hdr["width"], hdr["height"]) == (8, 6)
    assert pixels.shape == (6, 8)
    np.testing.assert_array_equal(pixels, img)

    wav = encode_wav(np.zeros(400, dtype=np.int16), rate=8000)
    hdr = parse_header(wav)
    samples = decode_media(wav, "audio")
    assert hdr["sample_rate"] == 8000 and hdr["duration_ms"] == 50
    assert samples.shape == (400,)

    # JPEG now routes to the real baseline codec: corrupt data is a
    # ValueError, not a stub
    with pytest.raises(ValueError):
        decode_media(b"\xff\xd8\xff\xe0 not decodable jpeg", "image")
    # only video remains a documented stub
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x00\x00\x18ftypmp42 fake video", "video")


def test_extract_features_with_real_decoder(spark):
    """extract_media_features over REAL decoded pixels/samples — the
    repo's former only stub now runs end-to-end on PNG and WAV rows."""
    from hll_spark.operators.multimodal import (
        decode_media,
        encode_png,
        encode_wav,
        extract_media_features,
    )

    rows = []
    for i in range(4):
        img = ((np.arange(48) * (i + 1)) % 251).astype(np.uint8).reshape(6, 8)
        rows.append((i, "image", bytearray(encode_png(img))))
    for i in range(4, 6):
        s = ((np.arange(64) * i) % 211 - 100).astype(np.int16)
        rows.append((i, "audio", bytearray(encode_wav(s))))
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = extract_media_features(df, decoder=decode_media).collect()
    assert len(out) == 6
    for r in out:
        assert len(r.feature) == 64 and all(v >= 0 for v in r.feature)


def test_png_roundtrip_property_based():
    """Hypothesis: any 8-bit image round-trips through the PNG codec
    (random shapes, all channel counts, full value range)."""
    from hypothesis import given, settings, strategies as st

    from hll_spark.operators.multimodal import decode_png, encode_png

    @settings(max_examples=60, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        ch=st.sampled_from([1, 2, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
    )
    def roundtrip(h, w, ch, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if ch == 1 else (h, w, ch)
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        np.testing.assert_array_equal(decode_png(encode_png(img)), img)

    roundtrip()


def test_encode_png_single_channel_3d():
    """(h, w, 1) is grayscale, not RGBA — round-trips to (h, w)."""
    from hll_spark.operators.multimodal import decode_png, encode_png

    img = (np.arange(48, dtype=np.uint8)).reshape(6, 8, 1)
    np.testing.assert_array_equal(decode_png(encode_png(img)), img[:, :, 0])


# -- GIF codec -------------------------------------------------------------


def _rand_gif_case(rng, n_colors, h, w):
    palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=(h, w), dtype=np.uint8)
    return idx, palette


def test_gif_roundtrip_palette_sizes():
    from hll_spark.operators.multimodal import decode_gif, encode_gif

    rng = np.random.default_rng(7)
    for n_colors, h, w in [(2, 5, 9), (4, 1, 1), (16, 13, 7), (256, 20, 33)]:
        idx, palette = _rand_gif_case(rng, n_colors, h, w)
        img = decode_gif(encode_gif(idx, palette))
        assert img.shape == (h, w, 3)
        assert np.array_equal(img, palette[idx])


def test_gif_decode_handles_dictionary_growth():
    """Our encoder never grows the LZW dictionary (fixed-width clear
    trick); hand-pack a stream that DOES, including a width bump and
    the KwKwK self-referencing case."""
    from hll_spark.operators.multimodal import decode_gif

    # 4-color table -> mcs=2, clear=4, eoi=5, first dynamic code=6
    # stream: CLEAR 1 2 [6=(1,2)] [8=KwKwK of prev=(1,2)->(1,2,1)] EOI
    codes = [(4, 3), (1, 3), (2, 3), (6, 3), (8, 4), (5, 4)]
    # width grows to 4 AFTER code 8 is added when table hits 8 entries:
    # table: 0..3,clear,eoi,6=(1,2),7=(2,1),8=(1,2,1) -> growth at 8
    acc = bitlen = 0
    data = bytearray()
    for code, width in codes:
        acc |= code << bitlen
        bitlen += width
        while bitlen >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            bitlen -= 8
    if bitlen:
        data.append(acc & 0xFF)
    palette = np.arange(12, dtype=np.uint8).reshape(4, 3)
    w, h = 7, 1
    gif = bytearray(b"GIF89a")
    gif += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    gif += bytes([0x80 | 1, 0, 0]) + palette.tobytes()
    gif += b"\x2c" + b"\x00" * 4
    gif += w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"
    gif += bytes([2, len(data)]) + bytes(data) + b"\x00\x3b"
    img = decode_gif(bytes(gif))
    # pixels: 1 2 (1 2) (1 2 1) = 1,2,1,2,1,2,1
    assert np.array_equal(img[0, :, 0], palette[[1, 2, 1, 2, 1, 2, 1], 0])


def test_gif_interlaced_roundtrip():
    """Interlace flag: rows transmitted in the 4-pass order must come
    back in display order."""
    from hll_spark.operators.multimodal import decode_gif, encode_gif

    rng = np.random.default_rng(11)
    idx, palette = _rand_gif_case(rng, 8, 17, 5)
    plain = bytearray(encode_gif(idx, palette))
    # flip the interlace bit and re-order rows into transmission order
    # (the encoder wrote display order, so pre-permute the input so the
    # decoder's de-interlace restores the original image)
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, 17, step))
    reenc = bytearray(encode_gif(idx[order], palette))
    desc = reenc.index(b"\x2c")
    assert reenc[desc + 9] == 0
    reenc[desc + 9] = 0x40
    img = decode_gif(bytes(reenc))
    assert np.array_equal(img, palette[idx])


def test_gif_decode_media_dispatch_and_header():
    from hll_spark.operators.multimodal import (
        decode_media,
        encode_gif,
        parse_header,
    )

    rng = np.random.default_rng(3)
    idx, palette = _rand_gif_case(rng, 16, 9, 14)
    b = encode_gif(idx, palette)
    hdr = parse_header(b)
    assert (hdr["format"], hdr["width"], hdr["height"]) == ("gif", 14, 9)
    assert np.array_equal(decode_media(b, "image"), palette[idx])


def test_gif_corrupt_inputs_rejected():
    from hll_spark.operators.multimodal import decode_gif, encode_gif

    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF")
    idx = np.zeros((4, 4), dtype=np.uint8)
    pal = np.zeros((2, 3), dtype=np.uint8)
    b = bytearray(encode_gif(idx, pal))
    with pytest.raises(ValueError):
        decode_gif(bytes(b[: len(b) // 2]))  # truncated pixel data


def test_parse_header_mp4():
    """Handcrafted minimal ISO-BMFF: ftyp + moov(mvhd + video trak +
    audio trak). Geometry comes from the VIDEO track (audio tkhd is
    0x0); duration from mvhd timescale math."""
    from hll_spark.operators.multimodal import parse_header

    def box(tag, payload):
        return (8 + len(payload)).to_bytes(4, "big") + tag + payload

    mvhd = bytes([0]) + b"\x00" * 11 + (1000).to_bytes(4, "big") \
        + (7500).to_bytes(4, "big") + b"\x00" * 80
    tkhd_v = bytes([0]) + b"\x00" * 75 \
        + (640 << 16).to_bytes(4, "big") + (360 << 16).to_bytes(4, "big")
    tkhd_a = bytes([0]) + b"\x00" * 75 + b"\x00" * 8
    moov = box(b"moov", box(b"mvhd", mvhd)
               + box(b"trak", box(b"tkhd", tkhd_a))
               + box(b"trak", box(b"tkhd", tkhd_v)))
    mp4 = box(b"ftyp", b"mp42\x00\x00\x00\x00mp42") + moov
    hdr = parse_header(mp4)
    assert hdr["format"] == "mp4"
    assert (hdr["width"], hdr["height"]) == (640, 360)
    assert hdr["duration_ms"] == 7500
    # version-1 mvhd (64-bit duration) and largesize boxes also parse
    mvhd1 = bytes([1]) + b"\x00" * 19 + (600).to_bytes(4, "big") \
        + (3000).to_bytes(8, "big") + b"\x00" * 80
    big_moov = (1).to_bytes(4, "big") + b"moov" \
        + (16 + len(box(b"mvhd", mvhd1))).to_bytes(8, "big") \
        + box(b"mvhd", mvhd1)
    hdr = parse_header(box(b"ftyp", b"isom") + big_moov)
    assert hdr["format"] == "mp4" and hdr["duration_ms"] == 5000
    # truncated box table must not raise
    assert parse_header(box(b"ftyp", b"isom") + b"\x00\x00\x00\x20mo")[
        "format"
    ] == "mp4"


def test_avi_mjpeg_video_roundtrip():
    """REAL video decode: MJPEG frames in an AVI container, each frame
    a baseline JPEG from the from-scratch codec."""
    from hll_spark.operators.multimodal import (
        decode_avi_mjpeg,
        decode_media,
        encode_avi_mjpeg,
        parse_header,
    )

    y, x = np.mgrid[0:16, 0:24]
    frames = np.stack(
        [
            np.stack(
                [(y * 3 + x + 20 * t) % 256, (x * 2 + t) % 256, (y * 4) % 256],
                axis=-1,
            )
            for t in range(5)
        ]
    ).astype(np.uint8)
    avi = encode_avi_mjpeg(frames, fps=8, quality=92)
    hdr = parse_header(avi)
    assert (hdr["format"], hdr["width"], hdr["height"]) == ("avi", 24, 16)
    assert hdr["duration_ms"] == (1_000_000 // 8) * 5 // 1000
    out = decode_avi_mjpeg(avi)
    assert out.shape == (5, 16, 24, 3)
    err = np.mean(np.abs(out.astype(int) - frames.astype(int)))
    assert err < 4.0  # lossy, but frame-faithful
    # frame sampling decodes every 2nd frame only
    assert decode_avi_mjpeg(avi, every_n=2).shape == (3, 16, 24, 3)
    # dispatch through decode_media
    assert np.array_equal(decode_media(avi, "video"), out)
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"RIFF\x00\x00\x00\x04AVI ")  # no frames

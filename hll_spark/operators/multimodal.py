"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery is real and tested — typed metadata schema,
Arrow batch shapes, mapInPandas partitioning — and so are two levels of
content access:

- container-HEADER parsing (:func:`parse_media_headers`): PNG/JPEG/GIF/
  BMP/WAV/MP4 dimensions, sample rate and duration read straight from
  the published byte layouts;
- pixel/sample DECODING (:func:`decode_media`): REAL for PNG (stdlib
  zlib + numpy unfiltering of all five scanline filters), GIF
  (pure-Python LZW), JPEG (from-scratch T.81 baseline codec,
  operators/jpegcodec.py) and WAV PCM (stdlib ``wave``) —
  oracle-checked against closed-form content sums (driver query
  ``decoded_media_stats``). VIDEO decodes natively for MJPEG-in-AVI
  (RIFF walk + per-frame baseline JPEG); only inter-frame codecs
  (H.264/VP9/...) raise ``NotImplementedError`` — the one genuinely
  library-bound case. The deterministic fake decoder remains for
  exercising the pipeline on those formats.

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
    """Decode raw media bytes into pixels/samples.

    REAL for PNG (stdlib zlib inflate + numpy scanline unfiltering, all
    five PNG filter types, 8-bit gray/gray+alpha/RGB/RGBA), GIF (pure-
    Python LZW, variable code width, interlacing, local palettes —
    first frame as RGB) and WAV PCM (stdlib ``wave``): returns a uint8
    pixel array (h, w[, channels]) or an int16/uint8 sample array
    (n[, channels]). JPEG decodes via the from-scratch baseline codec
    (operators/jpegcodec.py — T.81 sequential Huffman + DCT; correctness
    -grade throughput), and MJPEG-in-AVI video via
    :func:`decode_avi_mjpeg` (frames, h, w, 3). Only inter-frame video
    codecs remain stubbed: H.264-class decoding genuinely needs
    libraries (ffmpeg) absent from this environment; swap this body's
    fallthrough for a real decoder in production. Nothing in the
    distributed plan changes either way.
    """
    b = bytes(payload)
    if b[:8] == _PNG_SIG:
        return decode_png(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return decode_wav(b)
    if b[:3] == b"GIF" and b[3:6] in (b"87a", b"89a"):
        return decode_gif(b)
    if b[:2] == b"\xff\xd8":
        from .jpegcodec import decode_jpeg

        return decode_jpeg(b)
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        return decode_avi_mjpeg(b)
    raise NotImplementedError(
        "inter-frame video codecs (H.264/VP9/...) need codec libraries; "
        "MJPEG-in-AVI decodes natively — use fake_decode for "
        "deterministic testing of other formats"
    )


# -- PNG: encode/decode with stdlib zlib + numpy ---------------------------
#
# Layouts from the public PNG spec (RFC 2083 / W3C PNG): 8-byte
# signature, length-type-data-crc chunks, IHDR geometry, IDAT = zlib
# stream of filter-byte-prefixed scanlines, filters 0-4 defined on the
# raw bytes of the current/previous scanline.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline (spec §6.6)."""
    ai, bi, ci = (x.astype(np.int32) for x in (a, b, c))
    p = ai + bi - ci
    pa, pb, pc = np.abs(p - ai), np.abs(p - bi), np.abs(p - ci)
    return np.where(
        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
    ).astype(np.uint8)


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG encoder (8-bit, non-interlaced) for synthetic test /
    oracle media. Rotates through all five filter types row by row so a
    decoder must implement every unfilter branch to round-trip."""
    import struct
    import zlib

    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]  # (h, w, 1) is grayscale, not RGBA
    if img.ndim == 2:
        ctype, ch = 0, 1
    elif img.shape[2] == 2:
        ctype, ch = 4, 2
    elif img.shape[2] == 3:
        ctype, ch = 2, 3
    else:
        ctype, ch = 6, 4
    h, w = img.shape[0], img.shape[1]
    raw = img.reshape(h, w * ch)
    zero = np.zeros(w * ch, dtype=np.uint8)
    out = []
    for y in range(h):
        row, prev = raw[y], (raw[y - 1] if y else zero)
        left = np.concatenate([zero[:ch], row[:-ch]]) if w * ch > ch else zero[: w * ch]
        upleft = np.concatenate([zero[:ch], prev[:-ch]]) if w * ch > ch else zero[: w * ch]
        f = y % 5
        if f == 0:
            filt = row
        elif f == 1:
            filt = row - left
        elif f == 2:
            filt = row - prev
        elif f == 3:
            filt = row - ((left.astype(np.int32) + prev) // 2).astype(np.uint8)
        else:
            filt = row - _paeth(left, prev, upleft)
        out.append(bytes([f]) + filt.astype(np.uint8).tobytes())

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    idat = zlib.compress(b"".join(out))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def decode_png(b: bytes) -> np.ndarray:
    """Real PNG pixel decode: zlib-inflate the IDAT stream and undo the
    per-scanline filters. Supports the common web shape — 8-bit depth,
    color types 0/2/4/6, non-interlaced."""
    import struct
    import zlib

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    i, idat, meta = 8, [], None
    while i + 8 <= len(b):
        (clen,) = struct.unpack(">I", b[i : i + 4])
        tag = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + clen]
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            meta = (w, h, depth, ctype, interlace)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        i += 12 + clen
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, interlace = meta
    if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG depth={depth} ctype={ctype} interlace={interlace} "
            "not supported (8-bit non-interlaced only)"
        )
    ch = _PNG_CHANNELS[ctype]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    img = np.zeros((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        prev = img[y - 1] if y else zero
        if f == 0:
            cur = line
        elif f == 2:
            cur = line + prev
        else:
            # Sub/Average/Paeth reference the reconstructed LEFT pixel —
            # inherently sequential along the scanline (loop over pixel
            # positions, vector over channels).
            cur = line
            li = cur.astype(np.int32)
            pi = prev.astype(np.int32)
            for x in range(0, stride, ch):
                left = li[x - ch : x] if x else np.zeros(ch, np.int32)
                upleft = pi[x - ch : x] if x else np.zeros(ch, np.int32)
                up = pi[x : x + ch]
                if f == 1:
                    li[x : x + ch] = (li[x : x + ch] + left) & 0xFF
                elif f == 3:
                    li[x : x + ch] = (li[x : x + ch] + (left + up) // 2) & 0xFF
                elif f == 4:
                    pred = _paeth(
                        left.astype(np.uint8),
                        up.astype(np.uint8),
                        upleft.astype(np.uint8),
                    )
                    li[x : x + ch] = (li[x : x + ch] + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {f}")
            cur = li.astype(np.uint8)
        img[y] = cur
    img = img.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


# -- WAV PCM: encode/decode with stdlib wave --------------------------------


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Minimal 16-bit PCM WAV encoder for synthetic test/oracle media."""
    import io
    import wave

    samples = np.asarray(samples)
    n_ch = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(n_ch)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(b: bytes) -> np.ndarray:
    """Real WAV PCM decode via stdlib ``wave``: int16 (or uint8 for
    8-bit files) sample array, shape (n,) mono / (n, channels)."""
    import io
    import wave

    with wave.open(io.BytesIO(b), "rb") as wv:
        n_ch, sw = wv.getnchannels(), wv.getsampwidth()
        frames = wv.readframes(wv.getnframes())
    if sw == 2:
        arr = np.frombuffer(frames, dtype="<i2")
    elif sw == 1:
        arr = np.frombuffer(frames, dtype=np.uint8)
    else:
        raise NotImplementedError(f"WAV sample width {sw} not supported")
    return arr if n_ch == 1 else arr.reshape(-1, n_ch)


# -- GIF: encode/decode with pure-Python LZW -------------------------------
#
# Layouts from the public GIF89a specification: header + logical screen
# descriptor, optional global color table, extension blocks (0x21,
# skipped), image descriptors (0x2C) with optional local color table
# and interlacing, image data = LZW minimum-code-size byte followed by
# data sub-blocks. GIF packs LZW codes LSB-first with variable width
# growing 3..12 bits; Clear resets the dictionary, EOI terminates.


def encode_gif(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """Minimal GIF89a encoder for synthetic test/oracle media: one
    frame of palette indices (h, w) over an RGB palette (n, 3).

    Uses the fixed-code-width technique: a Clear code is emitted before
    the dictionary would grow past the initial width, so no compression
    — every decoder (including ours) must still handle the stream.
    """
    idx = np.asarray(idx, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    n = len(palette)
    bits = max(2, int(n - 1).bit_length())  # color-table size exponent
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[:n] = palette
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT flag + size, bg, aspect
    out += table.tobytes()
    out += b"\x2c" + b"\x00" * 4  # image descriptor at (0, 0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"
    mcs = bits  # LZW minimum code size
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    acc = bitlen = 0
    codes = bytearray()

    def emit(code):
        nonlocal acc, bitlen
        acc |= code << bitlen
        bitlen += width
        while bitlen >= 8:
            codes.append(acc & 0xFF)
            acc >>= 8
            bitlen -= 8

    emit(clear)
    budget = (1 << width) - (clear + 2) - 1  # codes before width would grow
    for i, px in enumerate(idx.ravel()):
        if i and i % max(budget, 1) == 0:
            emit(clear)
        emit(int(px))
    emit(eoi)
    if bitlen:
        codes.append(acc & 0xFF)
    out += bytes([mcs])
    for i in range(0, len(codes), 255):
        sub = codes[i:i + 255]
        out += bytes([len(sub)]) + sub
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(b: bytes) -> np.ndarray:
    """Real GIF pixel decode, first frame: LZW decompression (variable
    code width, Clear/EOI, LSB-first packing) + palette mapping +
    interlace reordering. Returns (h, w, 3) uint8 RGB. Transparency
    and later frames are ignored (documented single-frame semantics);
    the LZW inner loop is sequential by nature, so this is a
    correctness/AT-test decoder — production pipelines plug a codec
    library into the same ``decode_media`` seam."""
    if b[:3] != b"GIF" or b[3:6] not in (b"87a", b"89a"):
        raise ValueError("not a GIF")
    try:
        return _decode_gif_inner(b)
    except IndexError as exc:  # ran off the end of a truncated stream
        raise ValueError("GIF stream truncated") from exc


def _decode_gif_inner(b: bytes) -> np.ndarray:
    sw = int.from_bytes(b[6:8], "little")
    sh = int.from_bytes(b[8:10], "little")
    packed = b[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(b):
        block = b[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while b[pos]:
                pos += 1 + b[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left = int.from_bytes(b[pos + 1:pos + 3], "little")
        top = int.from_bytes(b[pos + 3:pos + 5], "little")
        w = int.from_bytes(b[pos + 5:pos + 7], "little")
        h = int.from_bytes(b[pos + 7:pos + 9], "little")
        ipacked = b[pos + 9]
        pos += 10
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(
                b[pos:pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image without a color table")
        mcs = b[pos]
        pos += 1
        data = bytearray()
        while b[pos]:
            ln = b[pos]
            data += b[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(data), mcs, w * h)
        if len(idx) < w * h:
            raise ValueError("GIF pixel data truncated")
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            # rows[y] = transmission-order index of display row y
            rows = np.empty(h, dtype=np.int64)
            r = 0
            for start, step in _GIF_INTERLACE:
                for y in range(start, h, step):
                    rows[y] = r
                    r += 1
            idx = idx.reshape(h, w)[rows].ravel()
        frame = table[np.clip(idx[: w * h], 0, len(table) - 1)]
        # first frame only; embed into the logical screen if offset
        img = frame.reshape(h, w, 3)
        if (left, top, w, h) != (0, 0, sw, sh):
            full = np.zeros((sh, sw, 3), dtype=np.uint8)
            full[top:top + h, left:left + w] = img[
                : max(0, sh - top), : max(0, sw - left)
            ]
            img = full
        return img
    raise ValueError("GIF contains no image data")


def _lzw_decode(data: bytes, mcs: int, limit: int) -> np.ndarray:
    """GIF-variant LZW: LSB-first bit packing, code width mcs+1..12,
    Clear resets the table, EOI ends. Stops after ``limit`` pixels."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    base = [(i,) for i in range(1 << mcs)] + [(), ()]
    table = list(base)
    width = mcs + 1
    acc = bitlen = ppos = 0
    out: list = []
    prev: tuple = ()
    for byte in data:
        acc |= byte << bitlen
        bitlen += 8
        while bitlen >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bitlen -= width
            if code == clear:
                table = list(base)
                width = mcs + 1
                prev = ()
                continue
            if code == eoi:
                return np.array(out[:limit], dtype=np.int32)
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev:
                entry = prev + (prev[0],)  # the KwKwK case
            else:
                raise ValueError("corrupt GIF LZW stream")
            out.extend(entry)
            if prev:
                table.append(prev + (entry[0],))
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if len(out) >= limit:
                return np.array(out[:limit], dtype=np.int32)
    return np.array(out[:limit], dtype=np.int32)


# -- video: MJPEG-in-AVI with the from-scratch JPEG codec ------------------
#
# AVI is plain RIFF chunk walking (public MS spec): LIST hdrl (avih +
# per-stream strl{strh,strf}), LIST movi holding '..dc'/'..db' frame
# chunks, optional idx1. Motion-JPEG stores every frame as a standalone
# baseline JPEG, so jpegcodec.decode_jpeg handles the payloads — real
# video decode with zero codec libraries. Inter-frame codecs (H.264...)
# are where libraries become genuinely unavoidable.


def encode_avi_mjpeg(frames: np.ndarray, fps: int = 10, quality: int = 90) -> bytes:
    """Minimal MJPEG AVI writer for synthetic test/oracle media.

    ``frames``: uint8 (n, h, w, 3) RGB (or (n, h, w) grayscale).
    """
    import struct

    from .jpegcodec import encode_jpeg

    frames = np.asarray(frames, dtype=np.uint8)
    n = frames.shape[0]
    h, w = frames.shape[1], frames.shape[2]
    payloads = [encode_jpeg(f, quality) for f in frames]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return tag + struct.pack("<I", len(data)) + data + (
            b"\x00" if len(data) & 1 else b""
        )

    def lst(tag: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", tag + data)

    avih = struct.pack(
        "<14I", 1_000_000 // fps, 0, 0, 0x10, n, 0, 1, 0, w, h, 0, 0, 0, 0
    )
    strh = b"vids" + b"MJPG" + struct.pack("<10I2H2I", 0, 0, 0, 1, fps, 0,
                                           n, 0, 0, 0, 0, 0, 0, 0)
    strf = struct.pack("<I2i2H6I", 40, w, h, 1, 24, 0x47504A4D,
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_mjpeg(b: bytes, every_n: int = 1) -> np.ndarray:
    """Real MJPEG/AVI video decode: walk RIFF to the movi list, decode
    every ``every_n``-th video frame chunk with the baseline JPEG codec,
    return (n_frames, h, w[, 3]) uint8. Non-MJPEG streams fail inside
    the JPEG decoder (their chunks are not JPEG bitstreams)."""
    import struct

    from .jpegcodec import decode_jpeg

    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    frames = []

    def walk(start: int, end: int) -> None:
        i = start
        while i + 8 <= end:
            tag = b[i:i + 4]
            (size,) = struct.unpack("<I", b[i + 4:i + 8])
            if tag == b"LIST":
                ltype = b[i + 8:i + 12]
                if ltype in (b"movi", b"hdrl", b"rec "):
                    walk(i + 12, i + 8 + size)
            elif tag[2:4] in (b"dc", b"db") and size:
                frames.append(b[i + 8:i + 8 + size])
            i += 8 + size + (size & 1)

    walk(12, len(b))
    if not frames:
        raise ValueError("AVI contains no video frame chunks")
    decoded = [decode_jpeg(f) for f in frames[::max(1, every_n)]]
    return np.stack(decoded)


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
    deterministic, fixed FEATURE_DIM output). Accepts any decoder
    output shape — pixels or samples are flattened and zero-padded to
    a FEATURE_DIM multiple."""
    flat = np.asarray(signal, dtype=np.float64).ravel()
    if flat.size == 0:
        return np.zeros(FEATURE_DIM)
    pad = (-flat.size) % FEATURE_DIM
    if pad:
        flat = np.concatenate([flat, np.zeros(pad)])
    bands = flat.reshape(FEATURE_DIM, -1)
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


MEDIA_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("sample_sum", LongType()),
    ]
)


def media_sample_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decoder=decode_media,
) -> DataFrame:
    """Per-media decoded-content statistics (count + sum of raw
    pixel/sample values) via in-partition decode — the oracle-checkable
    proof that :func:`decode_media` reconstructs the actual content, not
    just headers. Bytes never shuffle; only (id, 2 longs) rows do."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ns, sums = [], []
            for payload, kind in zip(pdf[payload_col], pdf["kind"]):
                flat = np.asarray(decoder(bytes(payload), kind)).ravel()
                ns.append(int(flat.size))
                sums.append(int(flat.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(np.int64),
                    "n_samples": ns,
                    "sample_sum": sums,
                }
            )

    return df.select(id_col, "kind", payload_col).mapInPandas(
        run, MEDIA_STATS_SCHEMA
    )


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
    descriptor, BMP info header, WAV RIFF fmt+data chunks, ISO-BMFF
    (MP4/MOV) moov/mvhd/tkhd boxes (duration + video-track geometry).
    Anything else is 'unknown'. (Pixel/sample DECODING stays stubbed in
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
        elif b[:4] == b"RIFF" and b[8:12] == b"AVI ":
            out["format"] = "avi"
            # LIST hdrl -> avih: us/frame, ..., total frames, ..., w, h
            i = 12
            while i + 8 <= len(b):
                tag = b[i:i + 4]
                clen = int.from_bytes(b[i + 4:i + 8], "little")
                if tag == b"LIST" and b[i + 8:i + 12] == b"hdrl":
                    i += 12
                    continue
                if tag == b"avih":
                    usf = int.from_bytes(b[i + 8:i + 12], "little")
                    nfr = int.from_bytes(b[i + 24:i + 28], "little")
                    out["width"] = int.from_bytes(b[i + 40:i + 44], "little")
                    out["height"] = int.from_bytes(b[i + 44:i + 48], "little")
                    out["duration_ms"] = usf * nfr // 1000
                    break
                i += 8 + clen + (clen & 1)
        elif len(b) >= 12 and b[4:8] == b"ftyp":
            # ISO-BMFF (MP4/MOV): walk top-level boxes to moov, then
            # mvhd (timescale+duration) and each trak's tkhd geometry.
            # Frame DECODE stays stubbed (inter-frame codecs need
            # libraries); the container layout is public spec.
            out["format"] = "mp4"
            _parse_mp4_boxes(b, 0, len(b), out)
    except (IndexError, ValueError):
        pass  # malformed header: stay 'unknown' / partial
    return out


def _parse_mp4_boxes(b: bytes, start: int, end: int, out: dict) -> None:
    i = start
    while i + 8 <= end:
        size = int.from_bytes(b[i:i + 4], "big")
        tag = b[i + 4:i + 8]
        body = i + 8
        if size == 1:  # 64-bit largesize
            size = int.from_bytes(b[i + 8:i + 16], "big")
            body = i + 16
        if size < 8 or i + size > end:
            return
        if tag in (b"moov", b"trak"):
            _parse_mp4_boxes(b, body, i + size, out)
        elif tag == b"mvhd":
            ver = b[body]
            if ver == 1:
                scale = int.from_bytes(b[body + 20:body + 24], "big")
                dur = int.from_bytes(b[body + 24:body + 32], "big")
            else:
                scale = int.from_bytes(b[body + 12:body + 16], "big")
                dur = int.from_bytes(b[body + 16:body + 20], "big")
            if scale:
                out["duration_ms"] = dur * 1000 // scale
        elif tag == b"tkhd":
            ver = b[body]
            geo = body + (88 if ver == 1 else 76)
            w = int.from_bytes(b[geo:geo + 4], "big") >> 16  # 16.16 fixed
            h = int.from_bytes(b[geo + 4:geo + 8], "big") >> 16
            if w and h:  # audio tracks carry 0x0 geometry
                out["width"], out["height"] = w, h
        i += size


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


# -- perceptual image hashing (dHash) --------------------------------------


def dhash_image(img: np.ndarray) -> int:
    """64-bit difference hash of an image — the standard perceptual
    near-dup fingerprint (robust to re-encoding and mild resizing,
    unlike byte/content hashes).

    Pinned convention (portable, library-free — this exact recipe is
    what the SQL oracle mirrors):

    - grayscale = float64 mean across channels (video: first frame)
    - tiny images are first integer-upscaled by pixel repetition so
      both dims reach the grid
    - box-downsample to 8 rows x 9 cols: rows/cols split into
      near-equal contiguous bands (``np.array_split`` boundaries),
      cell = mean of its band intersection
    - bit k = r*8 + c is 1 iff g[r, c] > g[r, c+1]

    Returns the hash as a Python int in [0, 2^64). An 8x9 input maps
    to the grid identity, so every bit is a closed-form function of
    the pixel formula — the driver oracle exploits that.
    """
    a = np.asarray(img, dtype=np.float64)
    if a.ndim == 4:  # video: (frames, h, w, ch) -> first frame
        a = a[0]
    if a.ndim == 3:
        a = a.mean(axis=2)
    if a.ndim != 2 or a.size == 0:
        raise ValueError("dhash_image needs a non-empty 2-D image")
    if a.shape[0] < 8:
        a = np.repeat(a, -(-8 // a.shape[0]), axis=0)
    if a.shape[1] < 9:
        a = np.repeat(a, -(-9 // a.shape[1]), axis=1)
    rows = [b.mean(axis=0) for b in np.array_split(a, 8, axis=0)]
    g = np.stack(
        [
            np.array([c.mean() for c in np.array_split(r, 9)])
            for r in rows
        ]
    )
    bits = (g[:, :-1] > g[:, 1:]).astype(np.uint64).ravel()
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("dhash", LongType()),
    ]
)


def image_dhash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decoder=decode_media,
) -> DataFrame:
    """(media_id, dhash) per image via in-partition decode + dHash.

    The heavy binary column never shuffles — each task decodes its own
    partition's images and emits 16-byte rows, the same traffic shape
    as ``media_sample_stats``. Null / undecodable / non-image payloads
    (web-scale corpora are full of them) yield a NULL dhash instead of
    failing the scan; 1-D decodes (audio) are rejected as non-images.
    The dhash lands as a SIGNED int64 (two's complement of the u64
    hash) so downstream XOR/bit_count stay in Spark's LONG space.
    Modality is decided by container magic BEFORE decoding (PNG / GIF
    / JPEG / MJPEG-AVI), not by decoded array shape — a stereo WAV
    also decodes 2-D and must not masquerade as an image.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for payload in pdf[payload_col]:
                if payload is None:
                    out.append(None)
                    continue
                b = bytes(payload)
                if not (
                    b[:8] == _PNG_SIG
                    or (b[:3] == b"GIF" and b[3:6] in (b"87a", b"89a"))
                    or b[:2] == b"\xff\xd8"
                    or (b[:4] == b"RIFF" and b[8:12] == b"AVI ")
                ):
                    out.append(None)
                    continue
                try:
                    arr = np.asarray(decoder(b, "image"))
                    if arr.ndim < 2:
                        out.append(None)
                        continue
                    out.append(
                        int(np.uint64(dhash_image(arr)).astype(np.int64))
                    )
                except Exception:
                    out.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(np.int64),
                    "dhash": pd.array(out, dtype="Int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, DHASH_SCHEMA)


# -- perceptual audio fingerprinting ---------------------------------------


def audio_fingerprint(samples: np.ndarray) -> int:
    """64-bit time-domain energy fingerprint — the audio analogue of
    :func:`dhash_image` (robust to level-preserving re-encoding and
    small trims, unlike byte hashes; no FFT dependency).

    Pinned convention (portable, exact-integer — the SQL oracle
    mirrors it verbatim):

    - multi-channel input: per-frame energy = sum of |sample| across
      channels (keeps everything in integers)
    - clips shorter than 65 frames are first integer-upsampled by
      frame repetition
    - split into 65 near-equal contiguous windows (``np.array_split``
      boundaries); window energy = sum of per-frame energies
    - bit k is 1 iff window k's MEAN energy exceeds window k+1's,
      compared exactly by cross-multiplication:
      ``sum[k] * len[k+1] > sum[k+1] * len[k]``

    A 650-frame mono clip gives 65 equal windows of 10, so every bit
    is a closed-form function of the sample formula — the driver
    oracle exploits that.
    """
    a = np.asarray(samples)
    if a.size == 0:
        raise ValueError("audio_fingerprint needs a non-empty sample array")
    e = np.abs(a.astype(np.int64, copy=False))
    if e.ndim == 2:
        e = e.sum(axis=1)
    if e.ndim != 1:
        raise ValueError("audio_fingerprint needs (n,) or (n, channels)")
    if e.shape[0] < 65:
        e = np.repeat(e, -(-65 // e.shape[0]))
    parts = np.array_split(e, 65)
    sums = np.array([int(p.sum()) for p in parts], dtype=object)
    lens = np.array([len(p) for p in parts], dtype=object)
    bits = [
        int(sums[k] * lens[k + 1] > sums[k + 1] * lens[k]) for k in range(64)
    ]
    return sum(b << k for k, b in enumerate(bits))


def audio_afp(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decoder=decode_media,
) -> DataFrame:
    """(media_id, afp) per audio clip via in-partition decode +
    :func:`audio_fingerprint` — same traffic shape and null policy as
    :func:`image_dhash`: bytes never shuffle, undecodable / non-audio
    payloads yield NULL. Modality is decided by container magic (WAV
    RIFF header) BEFORE decoding — a grayscale PNG also decodes to a
    2-D int array and must not masquerade as audio. Output column
    ``afp`` is the signed-i64 packing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for payload in pdf[payload_col]:
                if payload is None:
                    out.append(None)
                    continue
                b = bytes(payload)
                if not (b[:4] == b"RIFF" and b[8:12] == b"WAVE"):
                    out.append(None)
                    continue
                try:
                    arr = np.asarray(decoder(b, "audio"))
                    out.append(
                        int(np.uint64(audio_fingerprint(arr)).astype(np.int64))
                    )
                except Exception:
                    out.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(np.int64),
                    "afp": pd.array(out, dtype="Int64"),
                }
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("afp", LongType()),
        ]
    )
    return df.select(id_col, payload_col).mapInPandas(run, schema)

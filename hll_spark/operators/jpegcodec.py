"""Baseline JPEG (ITU-T T.81) codec in numpy + pure Python.

Removes the last image-decode stub in :mod:`multimodal` without codec
libraries: a spec-faithful **baseline sequential** decoder (SOF0 —
Huffman entropy coding, 8x8 DCT, 4:4:4 and subsampled chroma, restart
intervals, grayscale or YCbCr) and a matching encoder used to produce
round-trip test vectors (4:4:4 or 4:2:0, IJG-style quality scaling of
the Annex K tables).

Everything here comes from the public T.81 spec: Annex K quantization
and Huffman tables, the zigzag order, the F.1/F.2 entropy coding
procedures. The entropy decode is sequential by nature (bit-serial
Huffman), so throughput is correctness-grade, not production-grade —
at scale the same ``decode_media`` seam takes a codec library. The
IDCT/FDCT and color transforms are vectorized over all blocks at once.

Progressive (SOF2), arithmetic coding, and 12-bit precision are out of
scope and raise ``NotImplementedError``.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: ZIGZAG[i] = (row, col) flat index of the i-th
# coefficient in scan order (T.81 Figure 5)
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 quantization tables (luminance, chrominance), row-major
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (bits[1..16] counts, values)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# orthonormal DCT-II matrix: S = _DCT @ block @ _DCT.T is the JPEG FDCT
_DCT = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _DCT[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _scale_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> scaled Annex K table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255)


def _build_huffman(bits, values):
    """(bits, values) -> {(length, code): value} per T.81 C.2."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _encode_huffman(bits, values):
    """(bits, values) -> {value: (code, length)} for the encoder."""
    return {v: (c, ln) for (ln, c), v in _build_huffman(bits, values).items()}


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-pad to a byte boundary


def _fdct_quant(planes, qtabs):
    """Per-plane FDCT + quantization -> list of (blocks_v, blocks_h, 64)
    zigzagged int arrays."""
    out = []
    for plane, q in zip(planes, qtabs):
        h, w = plane.shape
        bv, bh = h // 8, w // 8
        blocks = (
            plane.reshape(bv, 8, bh, 8).transpose(0, 2, 1, 3).astype(np.float64)
            - 128.0
        )
        coef = np.einsum("ux,nmxy,vy->nmuv", _DCT, blocks, _DCT)
        flat = coef.reshape(bv, bh, 64)[:, :, ZIGZAG]
        qz = q[ZIGZAG].astype(np.float64)
        out.append(np.round(flat / qz).astype(np.int64))
    return out


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_every: int = 0,
) -> bytes:
    """Baseline JFIF encoder for synthetic test/oracle media.

    ``img``: uint8 (h, w) grayscale or (h, w, 3) RGB. ``subsample=True``
    writes 4:2:0 chroma (exercises the decoder's upsampling path);
    ``restart_every=N`` emits a DRI header and RSTn markers every N
    MCUs (exercises the decoder's restart path).
    """
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qlum = _scale_quant(QUANT_LUM, quality)
    qchrom = _scale_quant(QUANT_CHROM, quality)

    if gray:
        comps = [(1, 1, 0)]  # (h_factor, v_factor, quant id)
        mcu_w = mcu_h = 8
    else:
        f = 2 if subsample else 1
        comps = [(f, f, 0), (1, 1, 1), (1, 1, 1)]
        mcu_w = mcu_h = 8 * f

    # color transform + pad each plane to its MCU-aligned size (edge
    # replication keeps gradients smooth at the borders)
    if gray:
        planes = [img.astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]

    def pad_to(p, th, tw):
        return np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), "edge")

    ph = -(-h // mcu_h) * mcu_h
    pw = -(-w // mcu_w) * mcu_w
    full = [pad_to(p, ph, pw) for p in planes]
    if not gray and subsample:
        # 4:2:0: average 2x2 for chroma
        sub = []
        for i, p in enumerate(full):
            if i == 0:
                sub.append(p)
            else:
                sub.append(
                    p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
                )
        full = sub
    qtabs = [qlum] + ([] if gray else [qchrom, qchrom])
    coefs = _fdct_quant(full, qtabs)

    enc_dc = [_encode_huffman(*DC_LUM)] + (
        [] if gray else [_encode_huffman(*DC_CHROM)] * 2
    )
    enc_ac = [_encode_huffman(*AC_LUM)] + (
        [] if gray else [_encode_huffman(*AC_CHROM)] * 2
    )

    bw = _BitWriter()
    pred = [0] * len(comps)

    def write_block(ci, zz):
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        size = _category(diff)
        code, ln = enc_dc[ci][size]
        bw.put(code, ln)
        if size:
            amp = diff if diff >= 0 else diff + (1 << size) - 1
            bw.put(amp, size)
        run = 0
        last = 63
        while last > 0 and zz[last] == 0:
            last -= 1
        for k in range(1, last + 1):
            # T.81 8-bit precision caps AC magnitudes at category 10
            # (|v| <= 1023); quant step 1 at quality ~100 can exceed it
            # on synthetic high-contrast blocks — clamp instead of a
            # bare KeyError from the Huffman table (ADVICE r3)
            v = max(-1023, min(1023, int(zz[k])))
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = enc_ac[ci][0xF0]
                bw.put(code, ln)
                run -= 16
            size = _category(v)
            code, ln = enc_ac[ci][(run << 4) | size]
            bw.put(code, ln)
            amp = v if v >= 0 else v + (1 << size) - 1
            bw.put(amp, size)
            run = 0
        if last < 63:
            code, ln = enc_ac[ci][0x00]
            bw.put(code, ln)

    mb_v = ph // mcu_h
    mb_h = pw // mcu_w
    mcu_count = 0
    rst = 0
    for my in range(mb_v):
        for mx in range(mb_h):
            if restart_every and mcu_count and mcu_count % restart_every == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                for ci in range(len(comps)):
                    pred[ci] = 0
            for ci, (hf, vf, _) in enumerate(comps):
                for by in range(vf):
                    for bx in range(hf):
                        write_block(
                            ci, coefs[ci][my * vf + by, mx * hf + bx]
                        )
            mcu_count += 1
    bw.flush()

    # ---- container ----
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)
    for tid, tab in enumerate(qtabs[:2] if not gray else qtabs[:1]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) \
            + bytes(int(x) for x in tab[ZIGZAG])
    ncomp = len(comps)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, (hf, vf, qid) in enumerate(comps):
        out += bytes([ci + 1, (hf << 4) | vf, qid])
    huffs = [(0x00, DC_LUM), (0x10, AC_LUM)] + (
        [] if gray else [(0x01, DC_CHROM), (0x11, AC_CHROM)]
    )
    for tclass, (bits, values) in huffs:
        out += b"\xff\xc4" + struct.pack(
            ">HB", 19 + len(values), tclass
        ) + bytes(bits) + bytes(values)
    if restart_every:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_every)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        dc_id = 0 if ci == 0 else 1
        out += bytes([ci + 1, (dc_id << 4) | dc_id])
    out += b"\x00\x3f\x00"
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self):
        while self.n <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0xFF  # pad past the end
                self.n += 8
                continue
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                else:
                    # marker: back up and pad (caller handles RST/EOI)
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0xFF
                    self.n += 8
                    continue
            self.acc = (self.acc << 8) | byte
            self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

def _read_huffman(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline sequential JPEG decode: uint8 (h, w) grayscale or
    (h, w, 3) RGB. See module docstring for scope."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    size = None
    restart = 0
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        while i + 4 <= len(b) and b[i + 1] == 0xFF:
            i += 1  # T.81 B.1.1.2: optional 0xFF fill bytes before a marker
        marker = b[i + 1]
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", b[i + 2:i + 4])[0]
        seg = b[i + 4:i + 2 + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                prec, tid = seg[j] >> 4, seg[j] & 0x0F
                if prec:
                    raise NotImplementedError("16-bit quant tables")
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = np.frombuffer(
                    seg[j + 1:j + 65], dtype=np.uint8
                ).astype(np.int64)
                qtabs[tid] = tab
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tclass, tid = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1:j + 17])
                nvals = sum(bits)
                values = list(seg[j + 17:j + 17 + nvals])
                huff[(tclass, tid)] = _build_huffman(bits, values)
                j += 17 + nvals
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for c in range(ncomp):
                cid, hv, qid = seg[6 + 3 * c:9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "q": qid}
                )
            size = (h, w)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential JPEG")
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                for comp in comps:
                    if comp["id"] == cid:
                        comp["dc"] = tabs >> 4
                        comp["ac"] = tabs & 0x0F
            i = i + 2 + seglen
            return _decode_scan(b, i, comps, size, qtabs, huff, restart)
        i += 2 + seglen
    raise ValueError("JPEG has no scan data")


def _decode_scan(b, start, comps, size, qtabs, huff, restart):
    h, w = size
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mb_h = -(-w // mcu_w)
    mb_v = -(-h // mcu_h)
    br = _BitReader(b[start:])
    coefs = [
        np.zeros((mb_v * c["v"], mb_h * c["h"], 64), dtype=np.int64)
        for c in comps
    ]
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mb_v):
        for mx in range(mb_h):
            if restart and mcu_count and mcu_count % restart == 0:
                # discard pad bits and any prefetched padding — _fill
                # never consumes past a marker, so pos sits at (or
                # before) the RSTn byte pair
                br.acc = 0
                br.n = 0
                while (
                    br.pos + 1 < len(br.data)
                    and br.data[br.pos] == 0xFF
                    and br.data[br.pos + 1] == 0xFF
                ):
                    br.pos += 1  # fill bytes before the RST marker
                if (
                    br.pos + 1 < len(br.data)
                    and br.data[br.pos] == 0xFF
                    and 0xD0 <= br.data[br.pos + 1] <= 0xD7
                ):
                    br.pos += 2
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_tab = huff[(0, c["dc"])]
                ac_tab = huff[(1, c["ac"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = _read_huffman(br, dc_tab)
                        if s:
                            pred[ci] += _extend(br.bits(s), s)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _read_huffman(br, ac_tab)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            ssize = rs & 0x0F
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zz[k] = _extend(br.bits(ssize), ssize)
                            k += 1
                        coefs[ci][my * c["v"] + by, mx * c["h"] + bx] = zz
            mcu_count += 1

    # dequantize + IDCT, vectorized across all blocks per component
    planes = []
    for c, zzs in zip(comps, coefs):
        q = qtabs[c["q"]]
        bv, bh, _ = zzs.shape
        deq = (zzs * q[ZIGZAG]).astype(np.float64)
        coef = np.zeros((bv, bh, 64))
        coef[:, :, ZIGZAG] = deq
        coef = coef.reshape(bv, bh, 8, 8)
        spat = np.einsum("xu,nmuv,yv->nmxy", _DCT.T, coef, _DCT.T) + 128.0
        plane = spat.transpose(0, 2, 1, 3).reshape(bv * 8, bh * 8)
        # upsample to full MCU grid resolution
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[: mb_v * mcu_h, : mb_h * mcu_w])

    if len(comps) == 1:
        out = planes[0][:h, :w]
        return np.clip(np.round(out), 0, 255).astype(np.uint8)
    y, cb, cr = (p[:h, :w] for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bl], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)

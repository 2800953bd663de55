"""Storage-spec v1.0.0 byte-level tests (SURVEY.md §5.2(1), FIXTURES.md §4).

Golden vectors are hand-derived from the spec semantics
(/root/reference/serializer.go:85-146, hll.go:819-868,
schema_version.go:94-244): 3-byte header, then big-endian *ascending*
MSB-first bit-packed words.
"""

import numpy as np
import pytest

from hll_spark.sketchlib.hll import (
    EMPTY,
    EXPLICIT,
    FULL,
    SPARSE,
    HllConfig,
    HllSketch,
    _pack_words,
    _unpack_words,
)

RNG = np.random.default_rng(7)


def bitstring_pack(words, width):
    """Independent string-based bit packer for cross-checking."""
    bits = "".join(format(int(w), f"0{width}b") for w in words)
    bits += "0" * (-len(bits) % 8)
    return bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))


def test_empty_golden():
    s = HllSketch.empty(HllConfig(log2m=11, regwidth=5))
    # version 1 / type EMPTY=1; (rw-1)<<5 | log2m; sparse bit | auto(63)
    assert s.to_bytes().hex() == "118b7f"


def test_explicit_golden():
    s = HllSketch.empty(HllConfig(log2m=11, regwidth=5))
    s.add_hashed(np.array([2, 1], dtype=np.uint64))  # stored ascending
    assert (
        s.to_bytes().hex()
        == "128b7f" + "0000000000000001" + "0000000000000002"
    )


def test_sparse_golden():
    cfg = HllConfig(log2m=11, regwidth=5)
    s = HllSketch(cfg=cfg)
    s._init_storage(SPARSE)
    s.sparse = {512: 7, 1: 3, 2: 1}  # shortword (idx<<5)|val, ascending
    assert s.to_bytes().hex() == "138b7f" + "0023" + "0041" + "4007"


def test_full_golden_vs_independent_packer():
    cfg = HllConfig(log2m=4, regwidth=5, expthresh=0, sparse_on=False)
    s = HllSketch(cfg=cfg)
    s._init_storage(FULL)
    s.regs = np.arange(16, dtype=np.uint8)
    blob = s.to_bytes()
    # header: type FULL=4; (5-1)<<5|4 = 0x84; sparse off -> no 0x40 bit,
    # expthresh=0 -> cutoff code 0
    assert blob[:3].hex() == "148400"
    assert blob[3:] == bitstring_pack(range(16), 5)
    assert len(blob) == 3 + 10  # 80 bits of registers


@pytest.mark.parametrize("width", [1, 3, 5, 7, 8, 11, 16, 19, 21, 33, 64])
def test_pack_unpack_roundtrip_random_words(width):
    words = RNG.integers(0, 1 << width, size=257, dtype=np.uint64)
    packed = _pack_words(words, width)
    assert packed == bitstring_pack(words, width)
    unpacked = _unpack_words(packed, width)
    np.testing.assert_array_equal(unpacked[: len(words)], words)


@pytest.mark.parametrize(
    "log2m,regwidth,expthresh,sparse_on",
    [
        (4, 1, -1, True),
        (11, 5, -1, True),
        (14, 5, 0, True),
        (16, 6, 5, False),
        (30, 8, 18, True),
        (12, 2, -1, False),
    ],
)
def test_header_roundtrip_param_grid(log2m, regwidth, expthresh, sparse_on):
    cfg = HllConfig(log2m, regwidth, expthresh, sparse_on)
    for kind in (EMPTY, EXPLICIT, SPARSE, FULL):
        parsed, parsed_kind = HllConfig.from_header(cfg.header_bytes(kind))
        assert parsed_kind == kind
        assert parsed == cfg
        assert parsed.explicit_threshold == cfg.explicit_threshold


@pytest.mark.parametrize("n", [0, 5, 300, 2000, 20000])
def test_serialize_roundtrip_all_tiers(n):
    cfg = HllConfig(log2m=11, regwidth=5)
    s = HllSketch.empty(cfg)
    if n:
        s.add_hashed(RNG.integers(1, 2**64, size=n, dtype=np.uint64))
    blob = s.to_bytes()
    back = HllSketch.from_bytes(blob)
    assert back.kind == s.kind
    assert back.estimate() == s.estimate()
    # re-serialization is byte-identical (strict roundtrip)
    assert back.to_bytes() == blob


def test_roundtrip_union_idempotent():
    # mirrors hll_test.go:90-101: h ∪ roundtrip(h) must not change h
    cfg = HllConfig(log2m=14, regwidth=5)
    s = HllSketch.empty(cfg)
    s.add_hashed(RNG.integers(1, 2**64, size=6000, dtype=np.uint64))
    blob = s.to_bytes()
    twin = HllSketch.from_bytes(blob)
    s.union(twin)
    assert s.to_bytes() == blob


def test_sparse_deserialize_drops_zero_padding_registers():
    # shortWordLength can over-read padding bits as a zero register;
    # zero-valued registers must be dropped (hll.go:976-983)
    cfg = HllConfig(log2m=4, regwidth=1)  # shortword = 5 bits
    s = HllSketch(cfg=cfg)
    s._init_storage(SPARSE)
    s.sparse = {3: 1}
    back = HllSketch.from_bytes(s.to_bytes())
    assert back.sparse == {3: 1}


def test_from_bytes_rejects_garbage():
    with pytest.raises(ValueError):
        HllSketch.from_bytes(b"\x11")
    with pytest.raises(ValueError):
        HllSketch.from_bytes(b"\xff\x8b\x7f")  # bad schema version

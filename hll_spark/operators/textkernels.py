"""Batch-flattened numpy kernels for MinHash / SimHash / fingerprints.

Round-1 profiling showed the per-document Python loops inside the
Arrow-batched UDFs (one ``murmur3`` call and one ``pd.Series`` per doc)
dominated the near-dup operators. These kernels instead:

1. flatten every token of the Arrow batch into ONE array (one murmur
   call for the whole batch — the string kernel in sketchlib.hashing is
   already length-class vectorized),
2. derive shingle hashes numerically from consecutive token hashes
   (positional odd multipliers + xor + fmix64 — no gram strings are ever
   materialized), and
3. reduce per document with segmented ufuncs
   (``np.minimum.reduceat`` / ``np.add.reduceat``) — no Python loop over
   documents anywhere.

Shingle hash values differ from the round-1 string-join definition by
design; every consumer (MinHash signatures, LSH bands, exact-Jaccard on
hashed shingle sets, fingerprints) only needs a deterministic injective-
in-practice 64-bit shingle identity, which fmix64 over 64-bit token
hashes provides.
"""

from __future__ import annotations

from itertools import chain

import numpy as np
import pandas as pd

from ..sketchlib.hashing import murmur3_x64_128_low64

_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
_FMIX1 = np.array(0xFF51AFD7ED558CCD, dtype=np.uint64)
_FMIX2 = np.array(0xC4CEB9FE1A85EC53, dtype=np.uint64)
_S33 = np.array(33, dtype=np.uint64)
# positional odd multipliers for combining up to 64 token hashes
_POS_C = (
    np.arange(1, 65, dtype=np.uint64) * np.array(0x9E3779B97F4A7C15, np.uint64)
) | np.array(1, np.uint64)


def _fmix64(x: np.ndarray) -> np.ndarray:
    x = x ^ (x >> _S33)
    x = x * _FMIX1
    x = x ^ (x >> _S33)
    x = x * _FMIX2
    x = x ^ (x >> _S33)
    return x


def flat_token_hashes(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(tok_hashes u64 flat, doc_lens) — ONE murmur call per batch."""
    token_lists = [(t or "").split() for t in texts]
    lens = np.fromiter(
        (len(l) for l in token_lists), dtype=np.int64, count=len(token_lists)
    )
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.uint64), lens
    flat = list(chain.from_iterable(token_lists))
    return murmur3_x64_128_low64(pd.Series(flat)), lens


def flat_shingle_hashes(
    texts: pd.Series, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Shingle (word n-gram) hashes for a whole batch, flattened.

    Returns (sh u64 flat grouped by doc, n_sh per doc). Docs with
    0 < len < n contribute ONE shingle over all their tokens (same
    semantics as the reference join-all gram); empty docs contribute 0.
    """
    th, lens = flat_token_hashes(texts)
    ndocs = len(lens)
    n_sh = np.where(lens == 0, 0, np.maximum(lens - n + 1, 1)).astype(np.int64)
    total = int(n_sh.sum())
    out = np.zeros(total, dtype=np.uint64)
    if total == 0:
        return out, n_sh
    N = th.size
    starts = np.zeros(ndocs, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:]) if ndocs > 1 else None
    off = np.zeros(ndocs, dtype=np.int64)
    np.cumsum(n_sh[:-1], out=off[1:]) if ndocs > 1 else None
    doc_id = np.repeat(np.arange(ndocs, dtype=np.int64), lens)

    # full windows: start positions whose window stays inside one doc
    if N >= n:
        w = N - n + 1
        acc = th[:w] * _POS_C[0]
        for k in range(1, n):
            acc = acc ^ (th[k : w + k] * _POS_C[k])
        valid = doc_id[:w] == doc_id[n - 1 :]
        if valid.any():
            pos = np.nonzero(valid)[0]
            d = doc_id[pos]
            dest = off[d] + (pos - starts[d])
            out[dest] = _fmix64(acc[valid])

    # short docs (0 < len < n): one shingle = xor-combine of all tokens
    short = (lens > 0) & (lens < n)
    if short.any():
        sel = short[doc_id]
        sel_pos = np.nonzero(sel)[0]
        pos_in_doc = sel_pos - starts[doc_id[sel_pos]]  # < n <= 64
        contrib = th[sel_pos] * _POS_C[pos_in_doc]
        lens_short = lens[short]
        bounds = np.zeros(len(lens_short), dtype=np.int64)
        if len(lens_short) > 1:
            np.cumsum(lens_short[:-1], out=bounds[1:])
        xors = np.bitwise_xor.reduceat(contrib, bounds)
        out[off[short]] = _fmix64(xors)
    return out, n_sh


_SEED_MIX = np.array(0x9E3779B97F4A7C15, dtype=np.uint64)


def minhash_matrix(
    texts: pd.Series, k: int, shingle_n: int, slab_elems: int = 4_000_000
) -> np.ndarray:
    """(ndocs, k) uint64 MinHash signature matrix for a batch.

    k xor-finalizer permutations over the batch's flattened shingles,
    reduced per doc with ``np.minimum.reduceat``; permutations run in
    seed slabs so the working set stays ~``slab_elems`` elements
    (large fresh allocations serialize in this sandbox's kernel).
    Empty docs get the all-max sentinel row (same as round 1).
    """
    sh, n_sh = flat_shingle_hashes(texts, shingle_n)
    ndocs = len(n_sh)
    sigs = np.full((ndocs, k), _U64_MAX, dtype=np.uint64)
    total = sh.size
    if total == 0:
        return sigs
    nonempty = n_sh > 0
    ne_idx = np.nonzero(nonempty)[0]
    bounds = np.zeros(len(ne_idx), dtype=np.int64)
    if len(ne_idx) > 1:
        np.cumsum(n_sh[ne_idx][:-1], out=bounds[1:])
    slab = max(1, min(k, slab_elems // total))
    seeds = np.arange(1, k + 1, dtype=np.uint64) * _SEED_MIX
    for s0 in range(0, k, slab):
        s1 = min(k, s0 + slab)
        perms = _fmix64(sh[None, :] ^ seeds[s0:s1, None])
        mins = np.minimum.reduceat(perms, bounds, axis=1)  # (slab, n_nonempty)
        sigs[ne_idx, s0:s1] = mins.T
    return sigs


def band_keys_matrix(sigs: np.ndarray, bands: int, r: int) -> np.ndarray:
    """(ndocs, bands) int64 bucket keys: fold each band's r signature
    values with the xor-fmix chain — vectorized across docs AND bands."""
    ndocs = sigs.shape[0]
    arr = sigs.reshape(ndocs, bands, r)
    acc = np.zeros((ndocs, bands), dtype=np.uint64)
    for i in range(r):
        acc = _fmix64(acc ^ arr[:, :, i])
    return acc.view(np.int64)


def simhash_values(texts: pd.Series, bit_slab: int = 16) -> np.ndarray:
    """int64 SimHash per doc: per-bit majority vote over token hashes,
    computed as segmented bit-count sums (``np.add.reduceat``) in
    ``bit_slab``-wide slabs — no per-doc or per-bit Python loops."""
    th, lens = flat_token_hashes(texts)
    ndocs = len(lens)
    out = np.zeros(ndocs, dtype=np.uint64)
    if th.size == 0:
        return out.view(np.int64)
    nonempty = lens > 0
    ne_idx = np.nonzero(nonempty)[0]
    bounds = np.zeros(len(ne_idx), dtype=np.int64)
    if len(ne_idx) > 1:
        np.cumsum(lens[ne_idx][:-1], out=bounds[1:])
    half = lens[ne_idx][:, None]  # vote passes when 2*ones > n_tokens
    acc = np.zeros(len(ne_idx), dtype=np.uint64)
    for g in range(0, 64, bit_slab):
        shifts = np.arange(g, min(g + bit_slab, 64), dtype=np.uint64)
        bits = ((th[:, None] >> shifts[None, :]) & np.array(1, np.uint64)).astype(
            np.int64
        )
        ones = np.add.reduceat(bits, bounds, axis=0)  # (n_nonempty, slab)
        maj = (2 * ones) > half
        weights = (np.array(1, np.uint64) << shifts)[None, :]
        acc |= (maj.astype(np.uint64) * weights).sum(
            axis=1, dtype=np.uint64
        )
    out[ne_idx] = acc
    return out.view(np.int64)


def fingerprint_values(texts: pd.Series, shingle_n: int = 8) -> np.ndarray:
    """int64 per-doc fingerprint: min shingle hash (segmented min).
    Empty docs -> 0 (round-1 behavior)."""
    sh, n_sh = flat_shingle_hashes(texts, shingle_n)
    ndocs = len(n_sh)
    out = np.zeros(ndocs, dtype=np.uint64)
    if sh.size:
        ne_idx = np.nonzero(n_sh > 0)[0]
        bounds = np.zeros(len(ne_idx), dtype=np.int64)
        if len(ne_idx) > 1:
            np.cumsum(n_sh[ne_idx][:-1], out=bounds[1:])
        out[ne_idx] = np.minimum.reduceat(sh, bounds)
    return out.view(np.int64)

"""Mergeable Bloom filter over 64-bit keys — the fixed-size membership
sketch for incremental corpus dedup (filter a NEW batch of documents
against an already-ingested snapshot without shuffling or broadcasting the
snapshot itself).

Scale shape: each snapshot batch contributes an m-bit partial (numpy
uint64 words, fully vectorized adds); partials merge by bitwise OR — an
associative/commutative combine, so the reduce composes as map_batches
partials + a tree fold with NO shuffle of values, and the final broadcast
is a FIXED 128 KB regardless of snapshot size (contrast the broadcast-set
anti-join in ``text_analysis.decontaminate``, which grows with the
snapshot). False positives are removed by an exact verify pass, so the
operator's OUTPUT is exact; the sketch only bounds how much work the
verify sees.

Parameters: m = 2^20 bits, k = 5 hashes → FP rate ≈ (1-e^(-kn/m))^k,
under 1% up to n ≈ 100k keys per filter; shard the snapshot into multiple
filters (or raise m) past that. Index derivation is Kirsch–Mitzenmacher
double hashing (h1 + i·h2), standard and vectorizable.
"""

from __future__ import annotations

import numpy as np

BLOOM_BITS = 1 << 20  # 128 KB of uint64 words
BLOOM_K = 5
_WORDS = BLOOM_BITS // 64
_MIX = np.uint64(0x9E3779B97F4A7C15)  # odd → h2 never 0 after |1


def bloom_zeros() -> np.ndarray:
    return np.zeros(_WORDS, dtype=np.uint64)


def _indices(keys: np.ndarray) -> np.ndarray:
    """(n, k) bit positions for 64-bit keys (double hashing)."""
    h1 = keys.astype(np.uint64)
    h2 = (h1 * _MIX) | np.uint64(1)
    i = np.arange(BLOOM_K, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(BLOOM_BITS)


def bloom_add(bits: np.ndarray, keys: np.ndarray) -> None:
    """Set all k bits of every key, in place. Vectorized: one
    ``bitwise_or.at`` scatter over the flattened (n·k) index array."""
    idx = _indices(keys)
    np.bitwise_or.at(
        bits,
        (idx >> np.uint64(6)).astype(np.int64).ravel(),
        (np.uint64(1) << (idx & np.uint64(63))).ravel(),
    )


def bloom_maybe(bits: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Per-key boolean: ALL k bits set (possibly in the filter — exactness
    is the verify pass's job; False is definitive absence)."""
    idx = _indices(keys)
    got = (bits[(idx >> np.uint64(6)).astype(np.int64)]
           >> (idx & np.uint64(63))) & np.uint64(1)
    return got.all(axis=1)


def bloom_merge(parts: list[np.ndarray]) -> np.ndarray:
    out = bloom_zeros()
    for p in parts:
        np.bitwise_or(out, p, out=out)
    return out

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

Parameters: k = 5 hashes over m bits (``bloom_bits_for`` sizes m to the
key count at 16 bits/key ≈ 0.14% FP, clamped to a 16 MB broadcast cap;
``bloom_fp`` estimates the rate so callers can SKIP a saturated filter
rather than pay for a no-op prune). Index derivation is
Kirsch–Mitzenmacher double hashing (h1 + i·h2), standard and
vectorizable.
"""

from __future__ import annotations

import numpy as np

BLOOM_BITS = 1 << 20  # default: 128 KB of uint64 words
BLOOM_MAX_BITS = 1 << 27  # 16 MB broadcast cap — ~8M keys at ≤0.2% FP
BLOOM_K = 5
_MIX = np.uint64(0x9E3779B97F4A7C15)  # odd → h2 never 0 after |1


def bloom_zeros(m_bits: int = BLOOM_BITS) -> np.ndarray:
    return np.zeros(m_bits // 64, dtype=np.uint64)


def bloom_bits_for(n_keys: int, max_bits: int = BLOOM_MAX_BITS) -> int:
    """Filter size for ``n_keys``: next power of two ≥ 16 bits/key
    (FP ≈ 0.14% at k=5), clamped to [BLOOM_BITS, max_bits]. Callers check
    ``bloom_fp(n, m)`` and skip the filter when even max_bits saturates —
    a saturated prefilter is wasted compute, never a correctness issue."""
    floor = int(np.log2(BLOOM_BITS))
    want = 1 << max(floor, int(np.ceil(np.log2(max(16 * n_keys, 1)))))
    return min(want, max_bits)


def bloom_fp(n_keys: int, m_bits: int) -> float:
    """Expected false-positive rate of an n-key filter of m bits."""
    return float((1.0 - np.exp(-BLOOM_K * n_keys / m_bits)) ** BLOOM_K)


def _indices(keys: np.ndarray, m_bits: int) -> np.ndarray:
    """(n, k) bit positions for 64-bit keys (double hashing)."""
    h1 = keys.astype(np.uint64)
    h2 = (h1 * _MIX) | np.uint64(1)
    i = np.arange(BLOOM_K, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)


def bloom_add(bits: np.ndarray, keys: np.ndarray) -> None:
    """Set all k bits of every key, in place (m inferred from ``bits``).
    Vectorized: one ``bitwise_or.at`` scatter over the flattened (n·k)
    index array."""
    idx = _indices(keys, bits.size * 64)
    np.bitwise_or.at(
        bits,
        (idx >> np.uint64(6)).astype(np.int64).ravel(),
        (np.uint64(1) << (idx & np.uint64(63))).ravel(),
    )


def bloom_maybe(bits: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Per-key boolean: ALL k bits set (possibly in the filter — exactness
    is the verify pass's job; False is definitive absence)."""
    idx = _indices(keys, bits.size * 64)
    got = (bits[(idx >> np.uint64(6)).astype(np.int64)]
           >> (idx & np.uint64(63))) & np.uint64(1)
    return got.all(axis=1)


def bloom_merge(parts: list[np.ndarray]) -> np.ndarray:
    """OR-fold partials of ANY (consistent) size — the output takes its
    width from the partials, never from the default constant."""
    if not parts:
        return bloom_zeros()
    out = np.zeros_like(parts[0])
    for p in parts:
        np.bitwise_or(out, p, out=out)
    return out

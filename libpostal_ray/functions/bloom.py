"""Bloom filter — mergeable membership sketch for join-side pruning.

The reference embeds a bloom filter for token-membership tests (bloom.c);
here the sketch earns its place as the SEMI-JOIN PRUNER: build a
fixed-size bloom over the small side's keys (partial blooms per batch,
OR-merge — associative like the HLL registers), broadcast it once, and
filter the big side inside map_batches before any exact join/verify.  No
false negatives, so a bloom MISS is a definite non-member; only the
bloom-HIT subset (true members + ~0.8% false positives at 10 bits/key)
needs the exact path.  At 100 TB the exact build side may be too big to
broadcast — the bloom never is.

Double hashing (Kirsch-Mitzenstein): idx_i = h1 + i*h2 mod m, with
splitmix64-finalized h1/h2 — k probes from two hashes, vectorized.
"""

from __future__ import annotations

import numpy as np

from libpostal_ray.functions.hll import _finalize

BITS_PER_KEY = 10
N_PROBES = 7  # ~ (m/n) ln2 for 10 bits/key -> FP ~ 0.8%


def bloom_bits(n_keys: int, bits_per_key: int = BITS_PER_KEY) -> int:
    """Byte-aligned filter size in bits (>= 64)."""
    return max(((n_keys * bits_per_key + 7) // 8) * 8, 64)


def _probes(keys: np.ndarray, m_bits: int, k: int):
    h1 = _finalize(keys.astype(np.uint64))
    h2 = _finalize(keys.astype(np.uint64) ^ np.uint64(0xB10F)) | np.uint64(1)
    m = np.uint64(m_bits)
    with np.errstate(over="ignore"):
        for i in range(k):
            yield ((h1 + np.uint64(i) * h2) % m).astype(np.int64)


def bloom_build(
    keys: np.ndarray, m_bits: int, k: int = N_PROBES
) -> np.ndarray:
    """uint8 bit array of m_bits/8 bytes with ``keys`` inserted."""
    arr = np.zeros(m_bits // 8, dtype=np.uint8)
    if keys.size == 0:
        return arr
    for idx in _probes(keys, m_bits, k):
        np.bitwise_or.at(arr, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))
    return arr


def bloom_merge(blooms: np.ndarray) -> np.ndarray:
    """(j, m/8) stack -> elementwise OR."""
    return np.bitwise_or.reduce(blooms, axis=0)


def bloom_contains(
    arr: np.ndarray, keys: np.ndarray, k: int = N_PROBES
) -> np.ndarray:
    """Boolean per key: possibly-member (no false negatives)."""
    if keys.size == 0:
        return np.zeros(0, dtype=bool)
    m_bits = arr.shape[0] * 8
    out = np.ones(keys.shape[0], dtype=bool)
    for idx in _probes(keys, m_bits, k):
        out &= (arr[idx >> 3] & (np.uint8(1) << (idx & 7).astype(np.uint8))) != 0
    return out

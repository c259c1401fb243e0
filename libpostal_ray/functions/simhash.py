"""SimHash kernels — the short-content fallback sketch.

For content too short to support char-shingle MinHash (few shingles => high
estimator variance), we block on a 64-bit SimHash instead: per-bit majority
vote over the shingle hashes.  Two docs within Hamming distance d share at
least one of (d+1) equal-width chunks of the 64-bit hash (pigeonhole), so
emitting chunk keys as blocking keys catches all pairs with hamming <= d —
the same "neighboring bucket" trick as libpostal's geohash+neighbors blocking
(near_dupe.c:220-248: 9 spatial tokens so near-boundary points still collide).
"""

from __future__ import annotations

import numpy as np

from libpostal_ray.functions.hashing import as_key_i64, mix_fold_u64, rolling_shingle_hashes

_SHIFTS = np.arange(64, dtype=np.uint64)


def simhash_of_hashes(h: np.ndarray) -> np.uint64:
    """64-bit SimHash of one shingle-hash array (majority vote per bit)."""
    if h.shape[0] == 0:
        return np.uint64(0)
    bits = (h[:, None] >> _SHIFTS[None, :]) & np.uint64(1)  # (n, 64)
    votes = bits.sum(axis=0)
    out = np.uint64(0)
    maj = votes * 2 > h.shape[0]
    for i in np.nonzero(maj)[0]:
        out |= np.uint64(1) << np.uint64(i)
    return out


def simhash_batch(concat_hashes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """(n_docs,) uint64 SimHash for concatenated shingle hashes + offsets."""
    n_docs = offsets.shape[0] - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    if concat_hashes.shape[0] == 0:
        return out
    bits = ((concat_hashes[:, None] >> _SHIFTS[None, :]) & np.uint64(1)).astype(
        np.int32
    )
    seg_starts = offsets[:-1]
    nonempty = offsets[1:] > offsets[:-1]
    starts_ne = seg_starts[nonempty].astype(np.int64)
    votes = np.add.reduceat(bits, starts_ne, axis=0)  # (n_nonempty, 64)
    lens = (offsets[1:] - offsets[:-1])[nonempty][:, None]
    maj = (votes * 2 > lens).astype(np.uint64)  # (n_nonempty, 64)
    packed = (maj << _SHIFTS[None, :]).sum(axis=1, dtype=np.uint64)
    out[nonempty] = packed
    return out


def simhash_texts(texts, k: int) -> np.ndarray:
    """SimHash per text using k-byte shingles (k clamped to len for tiny docs:
    a doc shorter than k hashes its whole content as one shingle)."""
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        data = (t or "").encode("utf-8")
        kk = min(k, max(1, len(data)))
        out[i] = simhash_of_hashes(rolling_shingle_hashes(data, kk))
    return out


def simhash_chunk_keys(simhashes: np.ndarray, n_chunks: int) -> np.ndarray:
    """(n, n_chunks) int64 blocking keys: chunk index folded with chunk value.

    n_chunks = d+1 guarantees recall for hamming distance <= d.
    """
    width = 64 // n_chunks
    mask = np.uint64((1 << width) - 1)
    keys = np.empty((simhashes.shape[0], n_chunks), dtype=np.int64)
    for c in range(n_chunks):
        chunk = (simhashes >> np.uint64(c * width)) & mask
        keys[:, c] = as_key_i64(mix_fold_u64([chunk], salt=0x51A0 + c))
    return keys


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a XOR b (uint64 arrays)."""
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64)).view(
        np.uint8
    )
    return np.unpackbits(x.reshape(-1, 8), axis=1).sum(axis=1)

"""MinHash signature kernels (vectorized, batch-at-a-time).

Plays the role of libpostal's fuzzy-equivalence key families
(`name_word_hashes`: double-metaphone + quadgrams + acronyms,
near_dupe.c:321-585): a compact per-record sketch whose collisions imply
similarity.  Estimator: E[mean(sig_a == sig_b)] = Jaccard(shingles_a,
shingles_b); stderr = sqrt(J(1-J)/K).

The permutation family is h_k(x) = a_k * x + b_k (mod 2^64), a_k odd — a
multiply-shift universal family.  Seeds come from PipelineConfig (fixed),
so signatures are bit-identical across workers, retries and runs.
"""

from __future__ import annotations

import numpy as np

from libpostal_ray.functions.hashing import rolling_shingle_hashes

_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
# chunk the (n_shingles x num_perm) matrix so a signature batch stays < ~128MB
_PERM_CHUNK = 32


def minhash_of_hashes(h: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Signature (num_perm,) uint64 of one shingle-hash multiset."""
    if h.shape[0] == 0:
        return np.full(a.shape[0], _U64_MAX, dtype=np.uint64)
    with np.errstate(over="ignore"):
        sig = np.empty(a.shape[0], dtype=np.uint64)
        for s in range(0, a.shape[0], _PERM_CHUNK):
            e = min(s + _PERM_CHUNK, a.shape[0])
            m = h[:, None] * a[None, s:e] + b[None, s:e]
            sig[s:e] = m.min(axis=0)
    return sig


def minhash_batch(
    concat_hashes: np.ndarray,
    offsets: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
) -> np.ndarray:
    """Signatures for a batch of docs whose shingle hashes are concatenated.

    concat_hashes: (total,) uint64; offsets: (n_docs+1,) int64 segment bounds.
    Returns (n_docs, num_perm) uint64. Docs with zero shingles get all-ones
    sentinel signatures (never collide with real docs).

    Vectorized: per permutation-chunk, one big (total, chunk) multiply-add and
    a np.minimum.reduceat over the doc segments — no per-doc Python loop.
    """
    n_docs = offsets.shape[0] - 1
    K = a.shape[0]
    sig = np.full((n_docs, K), _U64_MAX, dtype=np.uint64)
    if concat_hashes.shape[0] == 0:
        return sig
    seg_starts = offsets[:-1]
    nonempty = offsets[1:] > offsets[:-1]
    # reduceat needs strictly valid start indices; run it over non-empty segs
    starts_ne = seg_starts[nonempty].astype(np.int64)
    with np.errstate(over="ignore"):
        for s in range(0, K, _PERM_CHUNK):
            e = min(s + _PERM_CHUNK, K)
            m = concat_hashes[:, None] * a[None, s:e] + b[None, s:e]
            red = np.minimum.reduceat(m, starts_ne, axis=0)
            sig[nonempty, s:e] = red
    return sig


def shingle_and_minhash(
    texts, k: int, a: np.ndarray, b: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """texts -> ((n, num_perm) signatures uint64, (n,) shingle counts int64)."""
    hashes = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        h = rolling_shingle_hashes((t or "").encode("utf-8"), k)
        counts[i] = h.shape[0]
        hashes.append(h)
    concat = np.concatenate(hashes) if hashes else np.empty(0, dtype=np.uint64)
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return minhash_batch(concat, offsets, a, b), counts


def oph_minhash_batch(
    concat_hashes: np.ndarray,
    offsets: np.ndarray,
    num_perm: int,
) -> np.ndarray:
    """One-permutation MinHash with rotation densification (Li/Owen/Zhang
    NIPS'12; Shrivastava ICML'17 densification): O(S) per doc instead of
    O(S*K) — the top log2(K) bits of each shingle hash pick a slot, the slot
    keeps the min hash, and empty slots borrow cyclically from the right.

    ~100x less arithmetic than K independent permutations at comparable
    estimator quality; this is what makes the signature stage byte-bound
    rather than K-bound at 100TB scale.

    Returns (n_docs, num_perm) uint64; all-sentinel rows for empty docs.
    """
    n_docs = offsets.shape[0] - 1
    K = num_perm
    assert K & (K - 1) == 0, "num_perm must be a power of two for OPH"
    kbits = K.bit_length() - 1
    sig = np.full((n_docs, K), _U64_MAX, dtype=np.uint64)
    total = concat_hashes.shape[0]
    if total == 0:
        return sig

    doc_idx = np.repeat(
        np.arange(n_docs, dtype=np.int64), np.diff(offsets).astype(np.int64)
    )
    slot = (concat_hashes >> np.uint64(64 - kbits)).astype(np.int64)
    flat = doc_idx * K + slot
    # scatter-min into the (n_docs*K,) signature vector: the target domain is
    # tiny relative to the shingle stream, and numpy's buffered ufunc.at is
    # ~50x faster than the sort+reduceat formulation (identical result)
    np.minimum.at(sig.reshape(-1), flat, concat_hashes)

    # rotation densification: empty slots copy their left neighbor (cyclic),
    # iterated until the longest empty run is filled.  Rows that are entirely
    # empty (zero shingles) keep the sentinel.
    nonempty_rows = np.diff(offsets) > 0
    sub = sig[nonempty_rows]
    while True:
        empty = sub == _U64_MAX
        if not empty.any():
            break
        donor = np.roll(sub, 1, axis=1)
        np.copyto(sub, donor, where=empty)
    sig[nonempty_rows] = sub
    return sig


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Estimated Jaccard from two signatures (fraction of agreeing perms)."""
    return float(np.mean(sig_a == sig_b))


def estimate_jaccard_matrix(anchor: np.ndarray, others: np.ndarray) -> np.ndarray:
    """(m,) estimated Jaccard of each row of others (m,K) vs anchor (K,)."""
    return (others == anchor[None, :]).mean(axis=1)

"""Deterministic hashing kernels.

The reference vendors murmur3 (`/root/reference/src/murmur/`) and uses khash
sets for expansion dedup (near_dupe.c:163-206).  We need:

  * sha256(content) — the per-row invariant carried through every stage
    (BASELINE.json input_hint).
  * a stable uint64 doc id derived from (repo, path, commit) — used as the
    union-find node id and the cluster representative tie-break
    (min id == min sha-derived id is deterministic).
  * a vectorized 64-bit rolling polynomial hash over UTF-8 bytes for
    char-shingles (ngrams.c:4-71 analog) — fully numpy, no per-shingle
    Python objects.

All are fixed-seed / constant-based: retries and reruns are idempotent.
"""

from __future__ import annotations

import hashlib

import numpy as np

# FNV-ish mixing constants (public domain constants, 64-bit).
_MIX_PRIME = np.uint64(0x100000001B3)
_MIX_OFFSET = np.uint64(0xCBF29CE484222325)
# polynomial rolling-hash base (odd, large; fixed)
_POLY_BASE = np.uint64(0x9E3779B97F4A7C15)


def stable_doc_id(repo, path, commit) -> np.ndarray:
    """int64 id = first 8 bytes of sha256(repo\\x00path\\x00commit), top bit
    cleared (63-bit, non-negative).

    Kept in the int64 domain because Ray Data groupby/aggregate key columns
    round-trip through Python ints -> Arrow int64; uint64 values above 2^63
    degrade to pickled-object columns.  Collision probability over 1e12 docs
    ~ (1e12)^2 / 2^64 — acceptable for blocking/cluster ids; the 32-byte
    sha256(content) column remains the exact-identity key.
    """
    out = np.empty(len(repo), dtype=np.int64)
    for i, (r, p, c) in enumerate(zip(repo, path, commit)):
        d = hashlib.sha256(
            f"{r}\x00{p}\x00{c}".encode("utf-8")
        ).digest()
        out[i] = int.from_bytes(d[:8], "big") & 0x7FFFFFFFFFFFFFFF
    return out


def as_key_i64(arr: np.ndarray) -> np.ndarray:
    """Fold a uint64 hash array into the non-negative int64 key domain
    (shuffle keys must stay int64-safe — see stable_doc_id)."""
    return (np.asarray(arr, dtype=np.uint64) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(
        np.int64
    )


def rolling_shingle_hashes(data, k: int) -> np.ndarray:
    """All k-byte shingle hashes of `data` as uint64 (len = max(0, n-k+1)).

    `data` may be bytes or a uint8 ndarray (a zero-copy Arrow buffer view —
    the scale path hashes a whole batch's concatenated value buffer in ONE
    call and masks out shingles that cross row boundaries).

    h[i] = sum_j data[i+j] * BASE^(k-1-j)  (mod 2^64) — k vectorized
    multiply-adds over the byte array; no Python-level shingle strings.
    MinHash over a multiset equals MinHash over the set, so no dedup needed.
    """
    if isinstance(data, np.ndarray):
        b = data.astype(np.uint64)
    else:
        b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = b.shape[0]
    if n < k:
        return np.empty(0, dtype=np.uint64)
    m = n - k + 1
    h = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h = h * _POLY_BASE + b[j : j + m]
        # final avalanche so nearby shingles don't cluster in key space
        h ^= h >> np.uint64(33)
        h = h * _MIX_PRIME
        h ^= h >> np.uint64(29)
    return h


def mix_fold_u64(columns: list[np.ndarray], salt: int = 0) -> np.ndarray:
    """Fold several uint64 arrays into one key array (FNV-style). Used for
    LSH band keys: fold(band_salt, sig[:, band*r:(band+1)*r])."""
    acc = np.full(columns[0].shape[0], _MIX_OFFSET ^ np.uint64(salt), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for col in columns:
            acc = (acc ^ col.astype(np.uint64)) * _MIX_PRIME
            acc ^= acc >> np.uint64(31)
    return acc

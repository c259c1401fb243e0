"""LSH band-key kernels — the blocking-key generator.

Analog of `near_dupe_hashes` (near_dupe.c:643-1216): per record, emit a small
set of keys such that similar records share at least one key; the host system
groups by key to find candidate pairs (README.md:609-626 delegates that
grouping to MapReduce — here it is ``ds.groupby("band_key")``).

Key = FNV-fold of (band index salt, the band's r signature values).  With
b bands of r rows, P(collision | Jaccard=J) = 1 - (1 - J^r)^b — the standard
S-curve; defaults b=16, r=8 put the midpoint at J ~ 0.707.
"""

from __future__ import annotations

import numpy as np

from libpostal_ray.functions.hashing import as_key_i64, mix_fold_u64


def band_keys(signatures: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """(n, num_perm) signatures -> (n, bands) int64 band keys (63-bit,
    non-negative: shuffle keys stay int64-safe, see hashing.as_key_i64)."""
    n, K = signatures.shape
    assert K == bands * rows_per_band
    keys = np.empty((n, bands), dtype=np.int64)
    sig3 = signatures.reshape(n, bands, rows_per_band)
    for band in range(bands):
        cols = [sig3[:, band, j] for j in range(rows_per_band)]
        # salt includes band index so identical row-slices in different bands
        # do not collide into one bucket
        keys[:, band] = as_key_i64(mix_fold_u64(cols, salt=0xBA4D0000 + band))
    return keys


def lsh_collision_probability(j: float, bands: int, rows_per_band: int) -> float:
    """P(at least one shared band | Jaccard=j)."""
    return 1.0 - (1.0 - j**rows_per_band) ** bands

"""Count-min sketch — mergeable point-frequency estimator.

Completes the sketch family (bloom = membership, HLL = cardinality,
Misra-Gries = top-frequency, MRL/KLL = quantiles): CMS answers "how many
times did THIS key occur" for arbitrary probe keys after one pass, in
``depth x width`` int64 cells regardless of the key cardinality.  The
sketch is LINEAR (cell-wise sums), so per-batch sketches merge by plain
addition — associative and blocking-independent, the same discipline as
the repo's integer partial sums.

Guarantees (Cormode-Muthukrishnan): estimates NEVER undercount;
``est - true <= (e / width) * N`` with probability ``>= 1 - e^-depth``
where N is the total inserted weight.  Row hashes are splitmix64 over
(key XOR row-salt) — the HLL lesson applies here too: weaker folds skew
the bucket distribution and break the bound (functions/hll.py:26).
"""

from __future__ import annotations

import numpy as np

_SALTS = (
    0xA0761D6478BD642F,
    0xE7037ED1A0B428DB,
    0x8EBC6AF09C88C6E3,
    0x589965CC75374CC3,
    0x1D8E4E27C47D124F,
    0xEB44ACCAB455D165,
)


def _row_hash(keys: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer over key ^ salt (vectorized, overflow wraps)."""
    with np.errstate(over="ignore"):
        z = keys.astype(np.uint64) ^ np.uint64(salt)
        z = z + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def empty_sketch(width: int = 2048, depth: int = 4) -> np.ndarray:
    if depth > len(_SALTS):
        raise ValueError(f"depth <= {len(_SALTS)} (fixed salt table)")
    return np.zeros((depth, width), dtype=np.int64)


def cms_add(
    sketch: np.ndarray, keys: np.ndarray, counts: np.ndarray | None = None
) -> np.ndarray:
    """Add (key, count) pairs in place; count defaults to 1 per entry.

    Keys are any int64/uint64 array; counts must be non-negative int64
    (the overestimate-only guarantee needs monotone cells)."""
    depth, width = sketch.shape
    if counts is None:
        counts = np.ones(keys.shape[0], dtype=np.int64)
    else:
        counts = counts.astype(np.int64)
        if counts.shape[0] and int(counts.min()) < 0:
            raise ValueError("cms_add: negative counts break the bound")
    for d in range(depth):
        idx = (_row_hash(keys, _SALTS[d]) % np.uint64(width)).astype(np.int64)
        np.add.at(sketch[d], idx, counts)
    return sketch


def cms_merge(sketches: list[np.ndarray]) -> np.ndarray:
    """Linear merge: cell-wise sum.  Shapes must match."""
    out = sketches[0].astype(np.int64).copy()
    for s in sketches[1:]:
        if s.shape != out.shape:
            raise ValueError("cms_merge: shape mismatch")
        out += s
    return out


def cms_query(sketch: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Point estimates: min over rows — always >= the true count."""
    depth, width = sketch.shape
    est = None
    for d in range(depth):
        idx = (_row_hash(keys, _SALTS[d]) % np.uint64(width)).astype(np.int64)
        vals = sketch[d][idx]
        est = vals if est is None else np.minimum(est, vals)
    return est if est is not None else np.zeros(0, dtype=np.int64)

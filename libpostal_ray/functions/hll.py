"""HyperLogLog — mergeable approximate-distinct sketch.

The §2.5 sketch family (the reference's bloom-filter role, bloom.c) gains
the cardinality member: each batch folds its values into a 2^p register
array (one np.maximum.at pass — no Python per row), registers merge by
elementwise max (associative + commutative, so any tree/shuffle order
works), and the estimate is Flajolet's bias-corrected harmonic mean with
the small-range linear-counting correction.

At 100 TB this is THE way to count distinct: the exchange carries one
2^p-byte row per (batch, group) instead of every distinct value; accuracy
is ~1.04/sqrt(2^p) regardless of cardinality.
"""

from __future__ import annotations

import numpy as np

HLL_P = 12  # 4096 registers, ~1.6% standard error, 4 KB per sketch


def empty_registers(p: int = HLL_P) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def _finalize(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: HLL needs uniform TOP bits (register index) and
    geometric leading zeros; the repo's FNV-style fold is fine for bucket
    keys but too weak here (measured: 8.5% low at n=1000, p=12)."""
    with np.errstate(over="ignore"):
        z = h + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def add_hashes(reg: np.ndarray, hashes: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """Fold 64-bit hashes into the register array in place; returns it.

    Register index = top p bits; rank = leading-zero count of the remaining
    64-p bits + 1 (capped by the field width)."""
    if hashes.size == 0:
        return reg
    h = _finalize(hashes.astype(np.uint64, copy=False))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining bits, left-aligned
    # leading zeros of rest within 64 bits; rest == 0 -> all 64-p bits zero
    nz = rest != 0
    lz = np.full(h.shape, 64 - p, dtype=np.int64)
    # bit_length via log2 is unsafe for >2^53; use a float64 trick on the
    # top 32 bits first, falling back to the low half — both exact because
    # each half is < 2^32 and floats hold ints < 2^53 exactly.
    hi = (rest >> np.uint64(32)).astype(np.int64)
    lo = (rest & np.uint64(0xFFFFFFFF)).astype(np.int64)
    bl_hi = np.frexp(hi.astype(np.float64))[1]  # bit_length of hi
    bl_lo = np.frexp(lo.astype(np.float64))[1]
    bit_len = np.where(hi > 0, bl_hi + 32, bl_lo)
    lz[nz] = (64 - bit_len[nz])
    rank = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def merge_registers(regs: np.ndarray) -> np.ndarray:
    """(k, 2^p) stack -> elementwise max."""
    return regs.max(axis=0)


def estimate(reg: np.ndarray) -> float:
    """Bias-corrected HLL estimate with linear counting for the small range."""
    m = reg.shape[0]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(reg == 0))
        if zeros:
            return m * np.log(m / zeros)
    return float(est)

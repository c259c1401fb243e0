"""Misra-Gries heavy hitters — mergeable top-frequency sketch.

Completes the sketch family (bloom = membership, HLL = cardinality, MG =
frequency): each batch reduces its exact token counts to at most ``m``
counters by the Misra-Gries decrement rule, summaries merge by summing
shared counters and re-pruning — associative, so the global picture is one
skinny groupby over <= m rows per batch instead of the full vocabulary.

Guarantees (standard MG): every reported count UNDERESTIMATES the true
count by at most the summary's accumulated decrement ``err``; any item
with true frequency > N/(m+1) is guaranteed to survive.  We carry ``err``
explicitly so downstream can report count ranges [cnt, cnt+err].
"""

from __future__ import annotations

import numpy as np


def mg_prune(
    items: np.ndarray, counts: np.ndarray, m: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Reduce (items, exact counts) to <= m counters.

    Vectorized MG: subtracting the (m+1)-th largest count from everything
    and dropping non-positives is equivalent to running the classic
    one-at-a-time decrement loop.  Returns (items, counts, decrement)."""
    if items.shape[0] <= m:
        return items, counts.astype(np.int64), 0
    order = np.argsort(counts)[::-1]
    dec = int(counts[order[m]])
    kept = counts > dec
    return items[kept], (counts[kept] - dec).astype(np.int64), dec


def mg_merge(
    summaries: list[tuple[np.ndarray, np.ndarray]], m: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Merge per-shard summaries: sum shared counters, re-prune to m."""
    items = np.concatenate([s[0] for s in summaries])
    counts = np.concatenate([s[1] for s in summaries])
    uniq, inv = np.unique(items, return_inverse=True)
    summed = np.zeros(uniq.shape[0], dtype=np.int64)
    np.add.at(summed, inv, counts)
    return mg_prune(uniq, summed, m)

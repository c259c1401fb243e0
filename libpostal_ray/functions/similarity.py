"""Exact similarity kernels — run only on candidate pairs (small data).

Analog of the reference's verification toolkit: `jaccard_similarity`
(jaccard.c:3-69), `expansions_intersect` (dedupe.c:13-31) and the fuzzy
scorers (soft_tfidf.c, string_similarity.c).  At dataset scale these never
touch the full corpus — LSH blocking has already reduced the problem to
candidate pairs.
"""

from __future__ import annotations

import numpy as np

from libpostal_ray.functions.hashing import rolling_shingle_hashes


def shingle_set(text: str, k: int) -> np.ndarray:
    """Sorted unique shingle hashes of a text (uint64)."""
    return np.unique(rolling_shingle_hashes((text or "").encode("utf-8"), k))


def exact_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """|A ∩ B| / |A ∪ B| over sorted-unique uint64 arrays (jaccard.c:3-26)."""
    if a.shape[0] == 0 and b.shape[0] == 0:
        return 1.0
    if a.shape[0] == 0 or b.shape[0] == 0:
        return 0.0
    inter = np.intersect1d(a, b, assume_unique=True).shape[0]
    union = a.shape[0] + b.shape[0] - inter
    return inter / union


def exact_jaccard_texts(t1: str, t2: str, k: int) -> float:
    return exact_jaccard(shingle_set(t1, k), shingle_set(t2, k))


def word_jaccard(t1: str, t2: str) -> float:
    """Whitespace-token set Jaccard — the word-level analog (used by the
    n-gram Jaccard dedup query; SQL-expressible for the oracle)."""
    s1, s2 = set((t1 or "").split()), set((t2 or "").split())
    if not s1 and not s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    return len(s1 & s2) / len(s1 | s2)


def cosine_topk(queries: np.ndarray, corpus: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Brute-force cosine top-k: queries (q, d) x corpus (n, d) -> (idx, score)
    each (q, k).  float64 matmul per batch; the corpus side is a broadcast
    matrix at pipeline level (ray.put once, read per actor)."""
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-30)
    cn = corpus / np.maximum(np.linalg.norm(corpus, axis=1, keepdims=True), 1e-30)
    scores = qn @ cn.T  # (q, n)
    k = min(k, corpus.shape[0])
    idx = np.argpartition(-scores, kth=k - 1, axis=1)[:, :k]
    row = np.arange(queries.shape[0])[:, None]
    part = scores[row, idx]
    order = np.argsort(-part, axis=1, kind="stable")
    return idx[row, order], part[row, order]

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


def damerau_levenshtein(a: str, b: str) -> int:
    """Optimal-string-alignment Damerau-Levenshtein distance
    (string_similarity.c:356-432 analog): edits = insert/delete/substitute/
    adjacent-transpose.  Row-wise numpy DP — O(len_a) vector ops per row,
    no per-cell Python.  Run only on candidate pairs (small data)."""
    if a == b:
        return 0
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return n + m
    ca = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    cb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev2 = None
    prev = np.arange(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i
        sub_cost = (cb != ca[i - 1]).astype(np.int64)
        # substitution / deletion are vectorizable; insertion needs a scan:
        # cur[j] = min(prev[j]+1, prev[j-1]+cost, cur[j-1]+1)
        base = np.minimum(prev[1:] + 1, prev[:-1] + sub_cost)
        if prev2 is not None and i >= 2:
            tr = (ca[i - 1] == cb[:-1]) & (ca[i - 2] == cb[1:])
            base[1:] = np.minimum(base[1:], np.where(tr, prev2[:-2] + 1, base[1:]))
        # prefix-scan for the insertion dependency: cur[j] =
        # min(base[j], cur[j-1]+1) == min over k<=j of base[k] + (j-k)
        shifted = base - np.arange(1, m + 1)
        np.minimum.accumulate(shifted, out=shifted)
        cur[1:] = np.minimum(base, shifted + np.arange(1, m + 1))
        cur[1:] = np.minimum(cur[1:], cur[0] + np.arange(1, m + 1))
        prev2, prev = prev, cur
    return int(prev[m])


def levenshtein(a: str, b: str) -> int:
    """Plain Levenshtein distance over UTF-8 BYTES (string_similarity.c:
    247-287 analog; byte-level to match DuckDB's ``levenshtein`` builtin for
    the oracle row).  Same row-wise numpy DP + prefix-scan as
    damerau_levenshtein, minus the transposition branch."""
    if a == b:
        return 0
    ca = np.frombuffer(a.encode("utf-8"), dtype=np.uint8)
    cb = np.frombuffer(b.encode("utf-8"), dtype=np.uint8)
    n, m = ca.shape[0], cb.shape[0]
    if n == 0 or m == 0:
        return n + m
    prev = np.arange(m + 1, dtype=np.int64)
    cur = np.empty(m + 1, dtype=np.int64)
    ins_idx = np.arange(1, m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        cur[0] = i
        base = np.minimum(prev[1:] + 1, prev[:-1] + (cb != ca[i - 1]))
        # insertion dependency cur[j] = min(base[j], cur[j-1]+1) resolved as
        # a running min of (base[k] - k) + j  (prefix scan, no Python cells)
        shifted = base - ins_idx
        np.minimum.accumulate(shifted, out=shifted)
        cur[1:] = np.minimum(base, shifted + ins_idx)
        cur[1:] = np.minimum(cur[1:], cur[0] + ins_idx)
        prev, cur = cur, prev
    return int(prev[m])


def affine_gap_distance(
    a: str,
    b: str,
    *,
    mismatch: int = 2,
    gap_open: int = 2,
    gap_extend: int = 1,
) -> int:
    """Affine-gap global alignment cost (string_similarity.c:27-287
    role), independent reimplementation of the published Gotoh (1982)
    three-matrix recurrence: a gap of length L costs
    gap_open + gap_extend*L, so ONE long insertion ("main street" vs
    "main st") is much cheaper than the same characters scattered —
    the property plain Levenshtein lacks.  Row-wise numpy DP: the
    within-row gap dependency X[j] = min(D[j-1]+o+e, X[j-1]+e)
    collapses to a prefix min of (Z[k] - e*k) exactly like the
    insertion scan in levenshtein above; no per-cell Python.  Run only
    on candidate pairs (small data)."""
    if a == b:
        return 0
    ca = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    cb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    n, m = ca.shape[0], cb.shape[0]
    o, e = gap_open, gap_extend
    if n == 0 or m == 0:
        return (o + e * (n + m)) if (n + m) else 0
    BIG = np.int64(1 << 40)
    j_idx = np.arange(1, m + 1, dtype=np.int64)
    # row 0: leading gap in b
    d_prev = np.empty(m + 1, dtype=np.int64)
    d_prev[0] = 0
    d_prev[1:] = o + e * j_idx
    y_prev = np.full(m + 1, BIG, dtype=np.int64)
    for i in range(1, n + 1):
        sub = (cb != ca[i - 1]).astype(np.int64) * mismatch
        m_row = np.empty(m + 1, dtype=np.int64)
        m_row[0] = BIG
        m_row[1:] = d_prev[:-1] + sub
        y_row = np.empty(m + 1, dtype=np.int64)
        y_row[0] = o + e * i
        y_row[1:] = np.minimum(d_prev[1:] + o + e, y_prev[1:] + e)
        # within-row gap (consuming b): X[j] = min_{k<j} Z[k] + o + e*(j-k)
        z = np.minimum(m_row, y_row)
        z[0] = min(int(y_row[0]), o + e * i)  # D[i][0]
        shifted = z[:-1] - e * np.arange(m, dtype=np.int64)
        np.minimum.accumulate(shifted, out=shifted)
        x_row = shifted + o + e * (1 + np.arange(m, dtype=np.int64))
        d_row = np.empty(m + 1, dtype=np.int64)
        d_row[0] = o + e * i
        d_row[1:] = np.minimum(z[1:], x_row)
        d_prev, y_prev = d_row, y_row
    return int(d_prev[m])


def affine_gap_similarity(a: str, b: str) -> float:
    """Normalized [0,1] affine-gap similarity: 1 - dist/worst where
    worst is the all-gaps alignment cost of the pair."""
    if a == b:
        return 1.0
    n, m = len(a), len(b)
    worst = (2 if n else 0) + n + (2 if m else 0) + m  # o=2, e=1 defaults
    if worst == 0:
        return 1.0
    return 1.0 - affine_gap_distance(a, b) / worst


def char_jaccard(a: str, b: str) -> float:
    """Set Jaccard over UTF-8 bytes — DuckDB ``jaccard`` builtin semantics
    (byte sets; identical to char sets on ASCII).  The single small-int
    division makes the double bit-identical to the oracle's."""
    sa = set(a.encode("utf-8"))
    sb = set(b.encode("utf-8"))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def dl_similarity(a: str, b: str) -> float:
    """1 - DL/max(len) in [0,1]."""
    mx = max(len(a), len(b))
    if mx == 0:
        return 1.0
    return 1.0 - damerau_levenshtein(a, b) / mx


def jaro_winkler(a: str, b: str, prefix_scale: float = 0.1) -> float:
    """Jaro-Winkler similarity (string_similarity.c:529-590 analog),
    numpy match-window implementation."""
    if a == b:
        return 1.0
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return 0.0
    ca = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    cb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    window = max(n, m) // 2 - 1
    b_taken = np.zeros(m, dtype=bool)
    a_match = np.full(n, -1, dtype=np.int64)
    for i in range(n):
        lo = max(0, i - window)
        hi = min(m, i + window + 1)
        cand = np.flatnonzero((cb[lo:hi] == ca[i]) & ~b_taken[lo:hi])
        if cand.size:
            j = lo + int(cand[0])
            b_taken[j] = True
            a_match[i] = j
    matches = a_match[a_match >= 0]
    mc = matches.shape[0]
    if mc == 0:
        return 0.0
    transpositions = int(np.sum(matches[1:] < matches[:-1]))
    jaro = (mc / n + mc / m + (mc - transpositions) / mc) / 3.0
    # Winkler prefix boost (common prefix up to 4)
    pmax = min(4, n, m)
    eq = ca[:pmax] == cb[:pmax]
    prefix = int(np.argmin(eq)) if not eq.all() else pmax
    return jaro + prefix * prefix_scale * (1.0 - jaro)


def possible_abbreviation(short: str, full: str, strict: bool = False) -> bool:
    """True if ``short`` could abbreviate ``full``
    (string_similarity.c:289-354 analog): same first char and ``short`` is
    a subsequence of ``full``; strict additionally requires the last chars
    to match ("rd"/"road" strict, "st"/"street" non-strict)."""
    if not short or not full or len(short) > len(full):
        return False
    if short[0] != full[0]:
        return False
    if strict and short[-1] != full[-1]:
        return False
    it = iter(full)
    return all(c in it for c in short)


def acronym_of(tokens) -> str:
    """First-letter acronym of a token sequence (acronyms.c:94-215 analog:
    'International Business Machines' -> 'ibm')."""
    return "".join(t[0] for t in tokens if t).lower()


def acronym_alignment(t1: str, t2: str) -> bool:
    """True if either side is the acronym of the other's tokens (with or
    without single-char stopword-ish tokens dropped) — the reference's
    acronym-alignment check before fuzzy scoring (near_dupe.c:416-559)."""
    a, b = (t1 or "").split(), (t2 or "").split()
    if len(a) == 1 and len(b) > 1:
        one, many = a[0].lower().replace(".", ""), b
    elif len(b) == 1 and len(a) > 1:
        one, many = b[0].lower().replace(".", ""), a
    else:
        return False
    if one == acronym_of(many):
        return True
    kept = [t for t in many if len(t) > 1]
    return len(kept) >= 2 and one == acronym_of(kept)


def soft_token_similarity(t1: str, t2: str, idf: dict | None = None) -> float:
    """Soft-TFIDF-style token-set cosine (soft_tfidf.c:128-592 analog):
    tokens match if equal, Jaro-Winkler >= 0.9, one abbreviates the
    other, or — for long tokens (>= 6 chars each, where JW's
    prefix-weighting misjudges internal runs) — affine-gap similarity
    >= 0.85 (soft_tfidf.c uses its affine-gap channel the same way);
    matched weight over the geometric mean of total weights.
    ``idf`` maps token -> weight (uniform 1.0 when absent — the reference
    likewise takes caller-supplied token_scores, libpostal.h:261-262)."""
    a, b = (t1 or "").split(), (t2 or "").split()
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0

    def w(tok: str) -> float:
        return float(idf.get(tok, 1.0)) if idf else 1.0

    used = [False] * len(b)
    matched = 0.0
    for ta in a:
        best_j = -1
        for j, tb in enumerate(b):
            if used[j]:
                continue
            if (
                ta == tb
                or jaro_winkler(ta, tb) >= 0.9
                or possible_abbreviation(ta, tb)
                or possible_abbreviation(tb, ta)
                or (
                    len(ta) >= 6
                    and len(tb) >= 6
                    and affine_gap_similarity(ta, tb) >= 0.85
                )
            ):
                best_j = j
                break
        if best_j >= 0:
            used[best_j] = True
            matched += (w(ta) * w(b[best_j])) ** 0.5
    wa = sum(w(t) for t in a)
    wb = sum(w(t) for t in b)
    return matched / max((wa * wb) ** 0.5, 1e-12)


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

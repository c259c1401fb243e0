"""Suffix-array exact-span pass — finds exact duplicated substrings >= L
chars ACROSS files within a repo-colocated partition.

Whole-file signatures miss a vendored function pasted into an otherwise
unrelated file; this pass catches exact shared spans.  Per partition
(pid = hash(repo) % P — same layout as the checkpoints):

  1. concatenate the partition's canonical contents with unique sentinels,
  2. build the suffix array by prefix doubling (numpy lexsort rounds,
     O(n log^2 n) — Manber & Myers),
  3. LCP array by Kasai's algorithm,
  4. runs of SA-adjacent suffixes with LCP >= min_span_len that span >= 2
     distinct docs emit SPAN edges (anchor pairing within the run).

Memory/time bound: a partition is truncated to substring_max_bytes
(deterministically, by doc_id order) and the truncation is flagged on the
emitted edges — no silent capping (SURVEY.md section 4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from libpostal_ray.config import PipelineConfig

STATUS_SPAN = 5  # between NEEDS_REVIEW(3) and LIKELY(6): exact shared span
LCP_CAP = 256    # default LCP work cap; the effective cap is
                 # max(LCP_CAP, cfg.min_span_len) so detection can never be
                 # silently disabled by a large min_span_len (see lcp_kasai)

# NOTE: span_len SATURATES at max(LCP_CAP, cfg.min_span_len) — it is the
# length of the shared span up to that cap, not the full span length.
SPAN_EDGE_SCHEMA = pa.schema(
    [
        ("src", pa.int64()),
        ("dst", pa.int64()),
        ("span_len", pa.int64()),
        ("truncated", pa.bool_()),
    ]
)


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of an int array (values >= 0) by prefix doubling.

    All intermediates are int32 (partitions are bounded far below 2^31
    rows by substring_max_bytes), halving sort/gather memory traffic — the
    lexsort rounds dominate the pass."""
    n = s.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.asarray(s, dtype=np.int32)
    k = 1
    while True:
        key2 = np.full(n, -1, dtype=np.int32)
        if k < n:
            key2[:-k] = rank[k:]
        # one u64 argsort instead of a two-key lexsort: ~2x less sort work
        # (rank and key2+1 both fit 31 bits)
        packed = (rank.astype(np.uint64) << np.uint64(32)) | (
            (key2 + 1).astype(np.uint64)
        )
        order = np.argsort(packed, kind="stable")
        r1 = rank[order]
        r2 = key2[order]
        changed = np.empty(n, dtype=np.int32)
        changed[0] = 0
        changed[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_rank = np.cumsum(changed, dtype=np.int32)
        rank = np.empty(n, dtype=np.int32)
        rank[order] = new_rank
        k *= 2
        if new_rank[-1] == n - 1 or k >= 2 * n:
            break
    return order.astype(np.int64)


def lcp_kasai(s: np.ndarray, sa: np.ndarray, cap: int = LCP_CAP) -> np.ndarray:
    """LCP array (lcp[i] = common prefix of sa[i-1], sa[i]); lcp[0] = 0.

    Kasai's per-char scan is a Python loop; instead all n-1 adjacent-suffix
    pairs advance TOGETHER in vectorized 64-element comparison rounds, each
    pair dropping out at its first mismatch — numpy-speed instead of
    interpreter-speed per char.  LCP values are CAPPED at ``cap`` (callers
    pass max(LCP_CAP, min_span_len) so detection works for any
    min_span_len); the cap bounds total work at O(n * cap / 64) even on
    adversarial tandem repeats where uncapped per-pair scanning would be
    quadratic (Kasai's amortization does not vectorize).  Reported span
    lengths saturate at the cap (SPAN_EDGE_SCHEMA note).
    Out-of-range positions use two DIFFERENT sentinel pads so they can
    never compare equal."""
    n = s.shape[0]
    lcp = np.zeros(n, dtype=np.int64)
    if n < 2:
        return lcp
    max_chunk = 64
    s32 = np.asarray(s, dtype=np.int32)  # values fit int32; halves gather bytes
    sp_a = np.concatenate((s32, np.full(max_chunk, -1, dtype=np.int32)))
    sp_b = np.concatenate((s32, np.full(max_chunk, -2, dtype=np.int32)))
    i_arr = sa[:-1]
    j_arr = sa[1:]
    h = np.zeros(n - 1, dtype=np.int64)
    active = np.arange(n - 1, dtype=np.int64)
    # geometric chunk schedule: the first rounds compare 1-2 chars — most
    # adjacent suffixes mismatch immediately, and gather volume is
    # active * chunk, so widening only as the active set thins keeps the
    # total traffic near sum-of-survivors instead of n * 64
    chunk = 1
    while active.size:
        base_i = i_arr[active] + h[active]
        base_j = j_arr[active] + h[active]
        if chunk == 1:
            eq1 = sp_a[base_i] == sp_b[base_j]
            h[active] += eq1
            active = active[eq1]
        else:
            win = np.arange(chunk, dtype=np.int64)
            eq = sp_a[base_i[:, None] + win] == sp_b[base_j[:, None] + win]
            full = eq.all(axis=1)
            first = np.where(full, chunk, eq.argmin(axis=1))
            h[active] += first
            active = active[full]
        active = active[h[active] < cap]
        chunk = min(max_chunk, chunk * 2)
    np.minimum(h, cap, out=h)
    lcp[1:] = h
    return lcp


def _span_edges_for_texts(
    doc_ids: np.ndarray, texts: list[str], min_span: int, truncated: bool
) -> pa.Table:
    """Core kernel: SPAN edges among one partition's texts."""
    # concatenated int32 text; separators are unique negative-free values
    # above the byte range so no span crosses a doc boundary
    parts = []
    owners = []
    for i, t in enumerate(texts):
        b = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8).astype(np.int64)
        parts.append(b)
        parts.append(np.array([256 + i], dtype=np.int64))  # unique sentinel
        owners.append(np.full(b.shape[0] + 1, i, dtype=np.int64))
    s = np.concatenate(parts)
    owner = np.concatenate(owners)
    sa = suffix_array(s)
    # effective cap >= min_span so a large min_span_len can never silently
    # detect zero spans (detection requires lcp >= min_span)
    lcp = lcp_kasai(s, sa, cap=max(LCP_CAP, min_span))

    # runs of SA positions where consecutive LCP >= min_span share a prefix
    # of >= min_span chars; distinct owners within a run => SPAN edges
    hot = lcp >= min_span
    starts = np.flatnonzero(hot & ~np.concatenate(([False], hot[:-1])))
    ends = np.flatnonzero(hot & ~np.concatenate((hot[1:], [False])))
    src_l, dst_l, len_l = [], [], []
    for st, en in zip(starts, ends):
        run = sa[st - 1 : en + 1]  # suffixes in the run
        docs = np.unique(owner[run])
        if docs.shape[0] < 2:
            continue
        span = int(lcp[st : en + 1].min())
        ids = np.unique(doc_ids[docs])
        anchor = ids.min()
        for d in ids:
            if d != anchor:
                src_l.append(anchor)
                dst_l.append(d)
                len_l.append(span)
    if not src_l:
        return SPAN_EDGE_SCHEMA.empty_table()
    src = np.array(src_l, dtype=np.int64)
    dst = np.array(dst_l, dtype=np.int64)
    spans = np.array(len_l, dtype=np.int64)
    # keep the longest span per pair
    order = np.lexsort((-spans, dst, src))
    src, dst, spans = src[order], dst[order], spans[order]
    keep = np.concatenate(([True], (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])))
    return pa.table(
        {
            "src": pa.array(src[keep]),
            "dst": pa.array(dst[keep]),
            "span_len": pa.array(spans[keep]),
            "truncated": pa.array(np.full(int(keep.sum()), truncated)),
        },
        schema=SPAN_EDGE_SCHEMA,
    )


class SubstringPartition:
    """map_groups callable over one repo-colocated partition."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()

    def __call__(self, group: pa.Table) -> pa.Table:
        cfg = self.cfg
        if group.num_rows < 2:
            return SPAN_EDGE_SCHEMA.empty_table()
        ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        texts = group["canonical"].take(pa.array(order)).to_pylist()
        ids = ids[order]
        # collapse content-identical docs to their min-id representative:
        # exact whole-file duplicates are already EXACT edges in the main
        # pipeline, and repeated identical texts turn the concatenation into
        # tandem repeats — the adversarial case for suffix-array LCP work.
        seen: dict[str, int] = {}
        keep_rows = []
        for i, t in enumerate(texts):
            if (t or "") not in seen:
                seen[t or ""] = i
                keep_rows.append(i)
        if len(keep_rows) < len(texts):
            texts = [texts[i] for i in keep_rows]
            ids = ids[np.array(keep_rows, dtype=np.int64)]
        if ids.shape[0] < 2:
            return SPAN_EDGE_SCHEMA.empty_table()
        # deterministic byte budget (smallest doc_ids kept)
        total = 0
        cut = len(texts)
        for i, t in enumerate(texts):
            total += len(t or "") + 1
            if total > cfg.substring_max_bytes:
                cut = i
                break
        truncated = cut < len(texts)
        if cut < 2:
            return SPAN_EDGE_SCHEMA.empty_table()
        return _span_edges_for_texts(
            ids[:cut], texts[:cut], cfg.min_span_len, truncated
        )

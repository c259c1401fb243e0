"""Suffix-array exact-span pass — finds exact duplicated substrings >= L
chars ACROSS files within a repo-colocated partition.

Whole-file signatures miss a vendored function pasted into an otherwise
unrelated file; this pass catches exact shared spans.  Per partition
(pid = hash(repo) % P — same layout as the checkpoints):

  1. concatenate the partition's canonical contents with unique sentinels,
  2. build the suffix array by REFINED prefix doubling (Larsson & Sadakane
     1999 qsufsort, vectorized: full streaming rounds while most groups
     are unresolved, then subset rounds over only the unresolved groups —
     worst case O(n log^2 n), typical cost one n log n sort + a
     fast-vanishing tail),
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
    """Suffix array of an int array (values >= 0) by refined prefix
    doubling (Larsson & Sadakane 1999, qsufsort): each doubling round
    re-sorts ONLY the suffixes still inside unresolved (size > 1) rank
    groups, instead of re-sorting all n.

    Ranks use the group-head-slot convention (a suffix's rank = the SA slot
    index of the first member of its group), so a subset update stays
    globally consistent — resolved suffixes keep their slot-index rank and
    never move again.  For real text the active set collapses after
    ~log2(longest repeat) rounds, so total work is n log n for the first
    round plus a rapidly vanishing tail — the plain-doubling version paid
    the full n log n EVERY round, which is what went superlinear past ~5M
    chars/partition.  Worst case (tandem repeats) is unchanged at
    O(n log^2 n); SubstringPartition already collapses content-identical
    docs, the adversarial input for that bound.

    All intermediates are int32 (partitions are bounded far below 2^31
    rows by substring_max_bytes), halving sort/gather memory traffic."""
    n = s.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n >= 1 << 30:  # int32 position+offset arithmetic below
        raise ValueError("suffix_array partition too large (>= 2^30 chars)")
    slots = np.arange(n, dtype=np.int32)
    sa = np.argsort(s, kind="stable").astype(np.int32)
    first = np.asarray(s, dtype=np.int32)[sa]
    start = np.empty(n, dtype=bool)
    start[0] = True
    start[1:] = first[1:] != first[:-1]
    # rank = slot index of the group head (monotone within sa order).
    # rank_pad is padded to 2n so pos + k (k < n) never needs a bounds
    # check: out-of-range reads hit the -1 pad, which sorts before every
    # real rank — one plain gather instead of a where/minimum/astype chain
    # (DRAM traffic is the budget on this host, not instructions)
    rank_slot = np.maximum.accumulate(np.where(start, slots, 0))
    rank_pad = np.full(2 * n, -1, dtype=np.int32)
    rank_pad[sa] = rank_slot
    n_unresolved = n - int(
        (start & np.concatenate((start[1:], [True]))).sum()
    )
    k = 1
    while k < n and n_unresolved:
        if n_unresolved * 2 > n:
            # FULL streaming round (early rounds, most groups unresolved):
            # keys are built in TEXT order with sequential slices — no
            # random gathers — and all n are re-sorted, exactly the classic
            # doubling round.  Cheaper than subset bookkeeping while the
            # active set is still ~n.
            packed = rank_pad[:n].astype(np.uint64)
            packed <<= np.uint64(32)
            key2 = np.full(n, -1, dtype=np.int32)
            key2[: n - k] = rank_pad[k:n]
            packed |= (key2 + np.int32(1)).astype(np.uint32)
            order32 = np.argsort(packed, kind="stable").astype(np.int32)
            sa = order32
            pk = packed[order32]
            boundary = np.empty(n, dtype=bool)
            boundary[0] = True
            boundary[1:] = pk[1:] != pk[:-1]
            rank_slot = np.maximum.accumulate(np.where(boundary, slots, 0))
            rank_pad[sa] = rank_slot
            start = boundary
            n_unresolved = n - int(
                (start & np.concatenate((start[1:], [True]))).sum()
            )
        else:
            # SUBSET round (Larsson-Sadakane refinement): re-sort only the
            # suffixes still inside unresolved groups; resolved suffixes
            # keep their slot-index rank and never move again
            single = start & np.concatenate((start[1:], [True]))
            active = np.flatnonzero(~single).astype(np.int32)
            if active.size == 0:
                break
            pos = sa[active]
            key2 = rank_pad[pos + np.int32(k)]
            # one u64 argsort instead of a two-key lexsort (both halves
            # fit 31 bits); the high half is the CURRENT rank, so ordering
            # can never cross old group boundaries
            packed = rank_slot[active].astype(np.uint64)
            packed <<= np.uint64(32)
            packed |= (key2 + np.int32(1)).astype(np.uint32)
            sub = np.argsort(packed, kind="stable")
            newpos = pos[sub]
            sa[active] = newpos
            # boundary detection needs only the LOW key after the sort:
            # sub permutes strictly within segments (stable sort, high
            # bits equal inside a segment), so segment starts keep their
            # positions — no need to gather the sorted u64 keys back
            k2s = key2[sub]
            boundary = np.empty(active.shape[0], dtype=bool)
            boundary[0] = True
            boundary[1:] = (
                (k2s[1:] != k2s[:-1])
                | start[active[1:]]
                | (active[1:] != active[:-1] + 1)
            )
            heads = np.maximum.accumulate(np.where(boundary, active, 0))
            rank_pad[newpos] = heads
            rank_slot[active] = heads
            new_heads = active[boundary]
            start[new_heads] = True
            # unresolved shrinkage: each new head splits off a group whose
            # members before it become countable; recount cheaply over the
            # touched range only when it is small, else globally
            n_unresolved = n - int(
                (start & np.concatenate((start[1:], [True]))).sum()
            )
        k *= 2
    return sa.astype(np.int64)


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

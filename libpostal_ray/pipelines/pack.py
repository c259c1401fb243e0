"""Distributed prefix sum and training-sequence packing.

``global_prefix_sum`` computes, for every row, the EXACT sum of a weight
column over all rows with a smaller order key — the distributed scan
primitive behind running totals, contiguous training-sequence packing,
and offset assignment for concatenated exports.  The reference's analog
is the deterministic file-offset bookkeeping of its model writers
(address_parser_io / trie serialization lay out records at exact
running-sum offsets); here it is a first-class distributed operator.

Physical plan (the radix-histogram shape shared with
``global_event_ranks`` and ``exact_global_quantile``, weighted):

  1. the skinny (order, weight) projection is materialized ONCE
     (16 B/row — the only state that flows; text never re-tokenizes);
  2. one scan emits per-batch WEIGHTED histograms over the <= 65536
     order-key buckets ((order - min) >> shift); a remote task merges
     them (tree reduce at cluster scale) and the exclusive scan of the
     merged histogram — 65536 int64s, broadcast once via ray.put —
     gives every bucket its exact global starting offset;
  3. pass 2 exchanges rows on bucket % P; each partition kernel sorts
     its bucket runs by order key and assigns
     offset[bucket] + within-bucket exclusive cumsum.  All arithmetic
     is int64 — the reduction is associative, so the result is
     bit-identical under ANY block layout.

Order keys must be UNIQUE (same contract as SQL's
``SUM() OVER (ORDER BY ...)``, which is nondeterministic under ties);
duplicates co-locate in one bucket and the kernel raises loudly.

``pack_training_sequences`` applies it to token counts: under pure
concatenation in doc_id order, ``start_tok`` is each doc's first global
token offset and ``seq_bin = start_tok // seq_len`` the fixed-length
training sequence its first token lands in — the deterministic packing
layout an export can shard by (every seq_bin's docs are contiguous in
doc order, so a shard = a seq_bin range).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Max, Min

N_BUCKETS = 1 << 16


def _empty_result(order_col: str, weight_col: str, extra: dict | None = None):
    cols = {
        order_col: pa.array([], type=pa.int64()),
        weight_col: pa.array([], type=pa.int64()),
        "start": pa.array([], type=pa.int64()),
    }
    for k, t in (extra or {}).items():
        cols[k] = pa.array([], type=t)
    return ray.data.from_arrow(pa.table(cols))


def global_prefix_sum(
    items: ray.data.Dataset,
    *,
    order_col: str,
    weight_col: str,
    partitions: int = 32,
) -> ray.data.Dataset:
    """(order_col, weight_col, start) where ``start`` = sum of
    ``weight_col`` over all rows with a strictly smaller ``order_col``
    (exclusive prefix sum in key order).  Keys: unique non-negative
    int64; weights: non-negative int64."""
    import ray as _ray

    skinny = items.select_columns([order_col, weight_col]).materialize()
    if skinny.count() == 0:
        return _empty_result(order_col, weight_col)
    mm = skinny.aggregate(
        Min(order_col, alias_name="lo"), Max(order_col, alias_name="hi")
    )
    lo, hi = int(mm["lo"]), int(mm["hi"])
    if lo < 0:
        raise ValueError("global_prefix_sum: order keys must be >= 0")
    shift = 0
    while ((hi - lo) >> shift) >= N_BUCKETS:  # max bucket must be < 2^16
        shift += 1

    def hist(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bucket": pa.nulls(0, pa.int64()),
                "w": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        k = batch[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if w.shape[0] and w.min() < 0:
            raise ValueError("global_prefix_sum: weights must be >= 0")
        bucket = (k - lo) >> shift
        u, inv = np.unique(bucket, return_inverse=True)
        sums = np.zeros(u.shape[0], dtype=np.int64)
        np.add.at(sums, inv, w)
        return pa.table({"bucket": pa.array(u), "w": pa.array(sums)})

    @_ray.remote
    def merge_hist(*blocks):
        acc = np.zeros(N_BUCKETS, dtype=np.int64)
        for b in blocks:
            if b.num_rows == 0 or "bucket" not in b.column_names:
                continue
            np.add.at(
                acc,
                b.column("bucket").to_numpy(zero_copy_only=False),
                b.column("w").to_numpy(zero_copy_only=False),
            )
        return np.concatenate(([0], np.cumsum(acc)[:-1])).astype(np.int64)

    hist_blocks = (
        skinny.map_batches(hist, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )
    offsets_ref = _ray.put(_ray.get(merge_hist.remote(*hist_blocks)))

    def keyed(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "k": pa.nulls(0, pa.int64()),
                "w": pa.nulls(0, pa.int64()),
                "bucket": pa.nulls(0, pa.int64()),
                "part": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        k = batch[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (k - lo) >> shift
        return pa.table(
            {
                "k": pa.array(k),
                "w": batch[weight_col].cast(pa.int64()),
                "bucket": pa.array(bucket),
                "part": pa.array(bucket % partitions),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                order_col: pa.nulls(0, pa.int64()),
                weight_col: pa.nulls(0, pa.int64()),
                "start": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "k" not in group.column_names:
            return empty
        offsets = _ray.get(offsets_ref)
        k = group["k"].to_numpy(zero_copy_only=False)
        w = group["w"].to_numpy(zero_copy_only=False)
        bucket = group["bucket"].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")  # bucket is monotone in k
        k, w, bucket = k[order], w[order], bucket[order]
        if k.shape[0] > 1 and (k[1:] == k[:-1]).any():
            raise ValueError(
                "global_prefix_sum: duplicate order keys (the prefix sum "
                "is only well-defined over a total order)"
            )
        cs = np.cumsum(w)
        excl = cs - w
        starts = np.flatnonzero(
            np.concatenate(([True], bucket[1:] != bucket[:-1]))
        )
        lens = np.diff(np.concatenate((starts, [bucket.shape[0]])))
        base = np.repeat(excl[starts], lens)
        return pa.table(
            {
                order_col: pa.array(k),
                weight_col: pa.array(w),
                "start": pa.array(offsets[bucket] + (excl - base)),
            }
        )

    return (
        skinny.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def token_counts(
    docs: ray.data.Dataset, *, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """(id, n_tokens) with SQL-parity whitespace semantics: 0 for
    blank/empty text, else the count of \\s+-separated tokens of the
    trimmed text."""

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "n_tokens": pa.array([], type=pa.int64()),
                }
            )
        txt = pc.fill_null(
            pc.utf8_trim_whitespace(batch[text_col].cast(pa.large_string())),
            "",
        )
        lists = pc.split_pattern_regex(txt, pattern=r"\s+")
        n = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        n = np.where(
            pc.equal(txt, "").to_numpy(zero_copy_only=False), 0, n
        ).astype(np.int64)
        return pa.table(
            {id_col: batch[id_col].cast(pa.int64()), "n_tokens": pa.array(n)}
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def pack_training_sequences(
    docs: ray.data.Dataset,
    *,
    seq_len: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    partitions: int = 32,
) -> ray.data.Dataset:
    """(doc_id, n_tokens, start_tok, seq_bin): each doc's global token
    offset under pure concatenation in doc_id order, and the fixed-
    ``seq_len`` training sequence its first token falls into."""
    counts = token_counts(docs, id_col=id_col, text_col=text_col)
    pref = global_prefix_sum(
        counts, order_col=id_col, weight_col="n_tokens", partitions=partitions
    )

    def binned(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "n_tokens": pa.array([], type=pa.int64()),
                    "start_tok": pa.array([], type=pa.int64()),
                    "seq_bin": pa.array([], type=pa.int64()),
                }
            )
        start = batch["start"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": batch["n_tokens"],
                "start_tok": batch["start"],
                "seq_bin": pa.array((start // seq_len).astype(np.int64)),
            }
        )

    return pref.map_batches(binned, batch_format="pyarrow")


def chunk_windows(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    window: int = 32,
    stride: int = 24,
    sub_batch_bytes: int = 1 << 18,
) -> ray.data.Dataset:
    """Sliding-window document chunking (the context-window prep step of
    an LLM training pipeline): each doc's whitespace tokens split into
    overlapping windows of ``window`` tokens every ``stride`` tokens
    (chunk c covers tokens [c*stride, c*stride+window)), the trailing
    chunk shorter.  Output (id, chunk_idx, n_tok, chunk_text) with
    chunk_text = single-space token join — i.e. the whitespace-
    NORMALIZED window, not a byte slice of the original.

    Row-local => embarrassingly parallel: ONE map_batches, no exchange.
    The kernel is a pure byte-level gather: token (start, len) runs come
    from one vectorized whitespace-mask pass over the Arrow data buffer
    (ASCII ws byte classes — multi-byte UTF-8 never contains them, so
    byte-level == char-level), and every chunk's text is assembled by a
    single fancy-indexed gather through an interleaved
    (token, separator) slice table — zero Python per row/token/chunk.
    Sub-batching bounds the gather temporaries (~10x content) to the
    cache-block budget (CLAUDE.md DRAM discipline)."""
    W, S = int(window), int(stride)
    if W < 1 or S < 1:
        raise ValueError("window and stride must be >= 1")

    def _chunk_rows(ids: np.ndarray, offl: np.ndarray, loc: np.ndarray):
        """One sub-batch: local offsets offl (offl[0] == 0), bytes loc."""
        nrows = ids.shape[0]
        ws = (
            (loc == 32) | (loc == 9) | (loc == 10)
            | (loc == 13) | (loc == 12) | (loc == 11)
        )
        nonws = ~ws
        prev = np.concatenate(([False], nonws[:-1]))
        nxt = np.concatenate((nonws[1:], [False]))
        rs = offl[:-1]
        rs = rs[rs < offl[1:]]  # nonempty rows only
        prev[rs] = False  # a row start never continues a token
        re_ = offl[1:] - 1
        re_ = re_[offl[1:] > offl[:-1]]
        nxt[re_] = False  # a row end never extends a token
        tok_s = np.flatnonzero(nonws & ~prev)
        tok_e = np.flatnonzero(nonws & ~nxt)
        if tok_s.shape[0] == 0:
            return None
        tok_len = tok_e - tok_s + 1
        tok_row = np.searchsorted(offl, tok_s, side="right") - 1
        n_tok_row = np.bincount(tok_row, minlength=nrows)
        tok_base = np.cumsum(n_tok_row) - n_tok_row
        c_row = np.where(n_tok_row > 0, (n_tok_row - 1) // S + 1, 0)
        n_chunks = int(c_row.sum())
        if n_chunks == 0:
            return None
        c_base = np.cumsum(c_row) - c_row
        chunk_row = np.repeat(np.arange(nrows), c_row)
        chunk_idx = np.arange(n_chunks) - c_base[chunk_row]
        first_tok = tok_base[chunk_row] + chunk_idx * S
        ntok = np.minimum(W, n_tok_row[chunk_row] - chunk_idx * S)
        # interleaved (token, sep, token, ...) slice table per chunk
        m = 2 * ntok - 1
        slice_base = np.cumsum(m) - m
        total_slices = int(m.sum())
        chunk_of = np.repeat(np.arange(n_chunks), m)
        r = np.arange(total_slices) - slice_base[chunk_of]
        is_tok = (r & 1) == 0
        gidx = first_tok[chunk_of] + (r >> 1)
        sep_pos = loc.shape[0]
        starts = np.where(is_tok, tok_s[gidx], sep_pos)
        lens = np.where(is_tok, tok_len[gidx], 1)
        buf2 = np.concatenate((loc, np.asarray([32], np.uint8)))
        cum = np.cumsum(lens)
        total_bytes = int(cum[-1]) if total_slices else 0
        idx = (
            np.arange(total_bytes, dtype=np.int64)
            - np.repeat(cum - lens, lens)
            + np.repeat(starts, lens)
        )
        out_bytes = buf2[idx]
        chunk_lens = np.add.reduceat(lens, slice_base)
        offs = np.concatenate(([0], np.cumsum(chunk_lens))).astype(np.int64)
        text = pa.Array.from_buffers(
            pa.large_string(),
            n_chunks,
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(out_bytes.tobytes())],
        ).cast(pa.string())
        return (
            ids[chunk_row],
            chunk_idx.astype(np.int64),
            ntok.astype(np.int64),
            text,
        )

    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id": pa.nulls(0, pa.int64()),
                "chunk_idx": pa.nulls(0, pa.int64()),
                "n_tok": pa.nulls(0, pa.int64()),
                "chunk_text": pa.nulls(0, pa.string()),
            }
        )
        if batch.num_rows == 0 or text_col not in batch.column_names:
            return empty
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch[text_col]
        arr = pa.concat_arrays(
            [c.cast(pa.large_string()) for c in col.chunks]
            if isinstance(col, pa.ChunkedArray)
            else [col.cast(pa.large_string())]
        )
        n = len(arr)
        bufs = arr.buffers()
        off = np.frombuffer(bufs[1], dtype=np.int64, count=n + 1, offset=arr.offset * 8)
        data = (
            np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None
            else np.zeros(0, np.uint8)
        )
        # validity: NULL texts produce no chunks (offsets of a null row
        # are empty-range in Arrow, so they fall out naturally)
        pieces = []
        lo = 0
        while lo < n:
            hi = lo + 1
            while hi < n and off[hi + 1] - off[lo] <= sub_batch_bytes:
                hi += 1
            offl = (off[lo : hi + 1] - off[lo]).astype(np.int64)
            loc = data[off[lo] : off[hi]]
            got = _chunk_rows(ids[lo:hi], offl, loc)
            if got is not None:
                pieces.append(got)
            lo = hi
        if not pieces:
            return empty
        return pa.table(
            {
                "id": pa.array(np.concatenate([p[0] for p in pieces])),
                "chunk_idx": pa.array(np.concatenate([p[1] for p in pieces])),
                "n_tok": pa.array(np.concatenate([p[2] for p in pieces])),
                "chunk_text": pa.concat_arrays([p[3] for p in pieces]),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")

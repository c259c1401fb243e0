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

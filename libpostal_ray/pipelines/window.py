"""Partitioned window functions — row_number / rank / lag / running sum.

The reference has no window functions (its closest analog is the per-doc
ordered token scan in near_dupe.c:283-315); these are the §2.9 streaming /
analytic operators a training-data pipeline needs (e.g. "rank documents
within a source by quality, keep top-k, carry the previous score").

Physical plan — the same shape as every wide operator in this repo:

  one hash exchange on ``key % P`` (P fixed, small — one Python group call
  per PARTITION, never per key) co-locates all rows of a key; inside the
  partition a single lexsort orders (key, order_cols...) and every window
  function is a vectorized segment kernel (cumsum-minus-offset for running
  sums, shift-within-segment for lag, run-start broadcast for rank).  Row
  count in == row count out; nothing materializes on the driver.

At 100 TB: the exchange ships only the key, order and value columns
(prune at the read), P scales with the cluster, and skewed keys cost only
their share of one partition — there is no per-key task or sort barrier.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

WINDOW_PARTITIONS = 32


def _segment_starts(sorted_keys: np.ndarray) -> np.ndarray:
    """Boolean mask: True where a new key segment begins (sorted input)."""
    if sorted_keys.shape[0] == 0:
        return np.zeros(0, dtype=bool)
    return np.concatenate(([True], sorted_keys[1:] != sorted_keys[:-1]))


def _seg_offset(new_seg: np.ndarray) -> np.ndarray:
    """For each row, the index of its segment's first row."""
    idx = np.arange(new_seg.shape[0], dtype=np.int64)
    starts = idx[new_seg]
    return np.repeat(starts, np.diff(np.concatenate((starts, [new_seg.shape[0]]))))


def window_over_key(
    ds: ray.data.Dataset,
    key: str,
    order_cols: list[str],
    value: str,
    *,
    lag_fill: int = -1,
    ntile_n: int = 4,
    partitions: int = WINDOW_PARTITIONS,
) -> ray.data.Dataset:
    """Compute (rn, value_rank, prev_value, cum_value) per ``key`` group.

    ``order_cols`` define the in-group order (must be int64-able and make
    the order total for deterministic rn); ``value`` is an int64 measure.
    rank() is competition rank over value DESC (ties share the smallest
    position); dense_rank packs the tie runs; ntile buckets the rn order
    into ``ntile_n`` near-equal groups (larger groups first, SQL NTILE
    semantics); lag is the previous row's value in window order
    (``lag_fill`` for the first row — avoids cross-engine NULL handling).
    Output: key, order_cols..., rn, value_rank, dense_rank, ntile,
    prev_value, cum_value.
    """

    def add_part(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "part", pa.array(k % partitions, type=pa.int64())
        )

    def kernel(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            empty = {key: pa.array([], type=pa.int64())}
            for c in order_cols:
                empty[c] = pa.array([], type=pa.int64())
            for c in (
                "rn",
                "value_rank",
                "dense_rank",
                "ntile",
                "prev_value",
                "cum_value",
            ):
                empty[c] = pa.array([], type=pa.int64())
            for c in ("percent_rank", "cume_dist"):
                empty[c] = pa.array([], type=pa.float64())
            return pa.table(empty)
        k = group[key].to_numpy(zero_copy_only=False).astype(np.int64)
        v = group[value].to_numpy(zero_copy_only=False).astype(np.int64)
        ords = [
            group[c].to_numpy(zero_copy_only=False).astype(np.int64)
            for c in order_cols
        ]
        # lexsort: last key is primary -> (key, order_cols...) ascending
        order = np.lexsort(tuple(reversed(ords)) + (k,))
        ks, vs = k[order], v[order]
        new_seg = _segment_starts(ks)
        off = _seg_offset(new_seg)
        idx = np.arange(n, dtype=np.int64)
        rn = idx - off + 1
        # running sum within segment: global cumsum minus the segment's base
        cs = np.cumsum(vs)
        base = np.where(off > 0, cs[off - 1], 0)
        cum_value = cs - base
        # lag(1) within segment
        prev = np.empty(n, dtype=np.int64)
        prev[0] = lag_fill
        prev[1:] = vs[:-1]
        prev[new_seg] = lag_fill
        # competition rank over value DESC: sort (key, -value); ties share
        # the run-start position within the segment
        order2 = np.lexsort((-v, k))
        ks2, vs2 = k[order2], v[order2]
        new_seg2 = _segment_starts(ks2)
        off2 = _seg_offset(new_seg2)
        pos2 = idx - off2
        new_run = new_seg2.copy()
        new_run[1:] |= vs2[1:] != vs2[:-1]
        run_pos = pos2[_seg_offset(new_run)]
        rank = np.empty(n, dtype=np.int64)
        rank[order2] = run_pos + 1
        rank = rank[order]
        # dense_rank: count of tie runs so far within the segment
        runs_cum = np.cumsum(new_run)
        drank = np.empty(n, dtype=np.int64)
        drank[order2] = runs_cum - runs_cum[_seg_offset(new_seg2)] + 1
        drank = drank[order]
        # percent_rank / cume_dist over the same value-DESC window as
        # value_rank.  Both are single divisions of small exact integers,
        # so the float64 results are bit-identical across engines (IEEE
        # division is exactly specified — the module's float-parity rule).
        #   percent_rank = (rank - 1) / (seg_size - 1)      (0.0 when n=1)
        #   cume_dist    = (last row index of the tie run - seg start + 1)
        #                  / seg_size
        run_starts2 = np.flatnonzero(new_run)
        run_lens2 = np.diff(np.concatenate((run_starts2, [n])))
        run_last2 = np.repeat(run_starts2 + run_lens2 - 1, run_lens2)
        cd_cnt = np.empty(n, dtype=np.int64)
        cd_cnt[order2] = run_last2 - off2 + 1
        cd_cnt = cd_cnt[order]
        # ntile over the rn order — exact SQL semantics: with q = n//B and
        # r = n%B, the FIRST r buckets take q+1 rows, the rest take q
        # (cross-checked vs DuckDB in the oracle row)
        seg_lens = np.diff(np.concatenate((np.flatnonzero(new_seg), [n])))
        seg_size = np.repeat(seg_lens, seg_lens)
        q, r = seg_size // ntile_n, seg_size % ntile_n
        big_span = r * (q + 1)  # rows covered by the q+1-sized buckets
        in_big = (rn - 1) < big_span
        ntile = np.where(
            in_big,
            (rn - 1) // np.maximum(q + 1, 1) + 1,
            r + (rn - 1 - big_span) // np.maximum(q, 1) + 1,
        )

        cols = {key: pa.array(ks, type=pa.int64())}
        for c, arr in zip(order_cols, ords):
            cols[c] = pa.array(arr[order], type=pa.int64())
        cols["rn"] = pa.array(rn, type=pa.int64())
        cols["value_rank"] = pa.array(rank, type=pa.int64())
        cols["dense_rank"] = pa.array(drank, type=pa.int64())
        cols["ntile"] = pa.array(ntile, type=pa.int64())
        cols["prev_value"] = pa.array(prev, type=pa.int64())
        cols["cum_value"] = pa.array(cum_value, type=pa.int64())
        seg_len_f = seg_size.astype(np.float64)
        cols["percent_rank"] = pa.array(
            np.where(seg_size > 1, (rank - 1) / np.maximum(seg_len_f - 1.0, 1.0), 0.0)
        )
        cols["cume_dist"] = pa.array(cd_cnt / seg_len_f)
        return pa.table(cols)

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def frames_over_key(
    ds: ray.data.Dataset,
    key: str,
    order_cols: list[str],
    value: str,
    *,
    preceding: int = 2,
    fill: int = -1,
    partitions: int = WINDOW_PARTITIONS,
) -> ray.data.Dataset:
    """Window FRAME functions per ``key`` group, in (order_cols) order.

    The frame family complements ``window_over_key`` (rank family):

      mov_sum     SUM  over ROWS ``preceding`` PRECEDING .. CURRENT ROW
      mov_avg     that sum / rows actually in the frame (exact int
                  division -> bit-identical float64 across engines)
      first_val   first_value over the partition
      last_val    last_value over ROWS UNBOUNDED PRECEDING .. UNBOUNDED
                  FOLLOWING (the full partition — SQL's default
                  last_value frame is a footgun; we use the full one)
      next_val    lead(1) within the partition (``fill`` on the last row)
      nth2_val    nth_value(2) over the full partition (``fill`` if the
                  partition has < 2 rows)

    Same physical plan as window_over_key: ONE key%P hash exchange, then
    every function is a vectorized segment kernel (cumsum differences
    with frame-clamped lower bounds; no per-key Python calls).  At 100 TB
    the exchange ships only (key, order, value) and P scales with the
    cluster.
    """

    def add_part(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "part", pa.array(k % partitions, type=pa.int64())
        )

    int_cols = ("mov_sum", "first_val", "last_val", "next_val", "nth2_val")

    def kernel(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            empty = {key: pa.array([], type=pa.int64())}
            for c in order_cols:
                empty[c] = pa.array([], type=pa.int64())
            for c in int_cols:
                empty[c] = pa.array([], type=pa.int64())
            empty["mov_avg"] = pa.array([], type=pa.float64())
            return pa.table(empty)
        k = group[key].to_numpy(zero_copy_only=False).astype(np.int64)
        v = group[value].to_numpy(zero_copy_only=False).astype(np.int64)
        ords = [
            group[c].to_numpy(zero_copy_only=False).astype(np.int64)
            for c in order_cols
        ]
        order = np.lexsort(tuple(reversed(ords)) + (k,))
        ks, vs = k[order], v[order]
        new_seg = _segment_starts(ks)
        off = _seg_offset(new_seg)
        idx = np.arange(n, dtype=np.int64)
        # frame lower bound: max(i - preceding, segment start)
        lo = np.maximum(idx - preceding, off)
        cs = np.cumsum(vs)
        base = np.where(lo > 0, cs[lo - 1], 0)
        mov_sum = cs - base
        in_frame = idx - lo + 1
        mov_avg = mov_sum / in_frame.astype(np.float64)
        first_val = vs[off]
        seg_lens = np.diff(np.concatenate((np.flatnonzero(new_seg), [n])))
        seg_size = np.repeat(seg_lens, seg_lens)
        last_idx = off + seg_size - 1
        last_val = vs[last_idx]
        nxt = np.empty(n, dtype=np.int64)
        nxt[:-1] = vs[1:]
        nxt[-1] = fill
        nxt[last_idx] = fill
        nth2 = np.where(seg_size >= 2, vs[np.minimum(off + 1, n - 1)], fill)

        cols = {key: pa.array(ks, type=pa.int64())}
        for c, arr in zip(order_cols, ords):
            cols[c] = pa.array(arr[order], type=pa.int64())
        for c, arr in zip(
            int_cols, (mov_sum, first_val, last_val, nxt, nth2)
        ):
            cols[c] = pa.array(arr, type=pa.int64())
        cols["mov_avg"] = pa.array(mov_avg, type=pa.float64())
        return pa.table(cols)

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )

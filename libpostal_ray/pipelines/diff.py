"""Snapshot diff — the CDC / regression-audit operator.

Given two corpus snapshots (OLD and NEW) keyed by an int64 id, classify
every key as added / removed / changed (unchanged rows are dropped — at
100 TB they are ~all rows, and the diff's value is the delta).  This is
the operator a training-data pipeline runs between two crawl refreshes or
two pipeline versions: "what did this release change?"

Reference parity: libpostal's test strategy is golden-fixture exactness
(test_expand.c fixtures); snapshot_diff is that idea as a distributed
operator — compare a pipeline's output table against the previous run's.

Physical plan (same discipline as every wide operator here):

  per-batch map: (key, 16-byte-content-digest as two int64 halves,
  side tag) — the content itself NEVER leaves the batch; the exchange
  carries 8+8+8+8 = 32 B/row of skinny columns.  One key%P hash exchange
  co-locates both sides; the per-partition kernel is a vectorized
  np.unique merge classifying each key by side presence + digest
  equality.  No engine join; at 100 TB the exchange volume is
  32 B x rows, and P scales with the cluster.

Digest equality stands in for content equality (128-bit sha256 prefix:
collision probability ~n^2/2^129 — negligible at any corpus size we can
name).  Keys must be non-negative int64 (engine-wide contract; uint64
keys silently degrade in Ray shuffles).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

DIFF_PARTITIONS = 32

STATUS_ADDED = "added"
STATUS_REMOVED = "removed"
STATUS_CHANGED = "changed"


def _digest_halves(col: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Two int64 halves of sha256(text)[:16] per row (vectorized buffer
    walk; hashlib per row is unavoidable — no vectorized sha exists)."""
    arr = pa.concat_arrays(
        [c.cast(pa.large_string()) for c in col.chunks]
        if isinstance(col, pa.ChunkedArray)
        else [col.cast(pa.large_string())]
    )
    n = len(arr)
    buf = arr.buffers()
    offsets = np.frombuffer(buf[1], dtype=np.int64, count=n + 1, offset=arr.offset * 8)
    data = np.frombuffer(buf[2], dtype=np.uint8) if buf[2] is not None else np.zeros(0, np.uint8)
    out = np.empty((n, 16), dtype=np.uint8)
    db = data.tobytes()
    for i in range(n):
        out[i] = np.frombuffer(
            hashlib.sha256(db[offsets[i] : offsets[i + 1]]).digest()[:16],
            dtype=np.uint8,
        )
    halves = out.view(np.int64).reshape(n, 2)
    return halves[:, 0].copy(), halves[:, 1].copy()


def snapshot_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    *,
    key: str,
    text_col: str,
    partitions: int = DIFF_PARTITIONS,
    statuses: tuple[str, ...] = (STATUS_ADDED, STATUS_REMOVED, STATUS_CHANGED),
) -> ray.data.Dataset:
    """Diff two snapshots -> (key, status) for every non-unchanged key.

    ``key`` must be unique per snapshot (a key appearing twice on one
    side is classified by its LAST digest in partition order — snapshot
    semantics assume upstream dedup, as documents_upsert guarantees).

    ``statuses`` restricts what the kernel emits.  SCD-2 callers pass
    ("added", "changed"): with a small re-crawl delta, 'removed' covers
    ~all of the base, and dropping it in-kernel keeps the verdict stream
    O(|delta|) instead of O(|base|).
    """

    def side_map(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
            h0, h1 = _digest_halves(batch[text_col])
            return pa.table(
                {
                    "k": pa.array(k),
                    "h0": pa.array(h0),
                    "h1": pa.array(h1),
                    "side": pa.array(
                        np.full(k.shape[0], side, dtype=np.int64)
                    ),
                    "part": pa.array(k % partitions),
                }
            )

        return fn

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "k": pa.nulls(0, pa.int64()),
                "status": pa.nulls(0, pa.string()),
            }
        )
        if group.num_rows == 0 or "side" not in group.column_names:
            return empty
        k = group["k"].to_numpy(zero_copy_only=False)
        h0 = group["h0"].to_numpy(zero_copy_only=False)
        h1 = group["h1"].to_numpy(zero_copy_only=False)
        side = group["side"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        m = uk.shape[0]
        oldseen = np.zeros(m, dtype=bool)
        newseen = np.zeros(m, dtype=bool)
        oh0 = np.zeros(m, dtype=np.int64)
        oh1 = np.zeros(m, dtype=np.int64)
        nh0 = np.zeros(m, dtype=np.int64)
        nh1 = np.zeros(m, dtype=np.int64)
        om = side == 0
        oldseen[inv[om]] = True
        newseen[inv[~om]] = True
        oh0[inv[om]] = h0[om]
        oh1[inv[om]] = h1[om]
        nh0[inv[~om]] = h0[~om]
        nh1[inv[~om]] = h1[~om]
        added = ~oldseen & newseen
        removed = oldseen & ~newseen
        changed = oldseen & newseen & ((oh0 != nh0) | (oh1 != nh1))
        if STATUS_ADDED not in statuses:
            added[:] = False
        if STATUS_REMOVED not in statuses:
            removed[:] = False
        if STATUS_CHANGED not in statuses:
            changed[:] = False
        keep = added | removed | changed
        status = np.where(
            added[keep],
            STATUS_ADDED,
            np.where(removed[keep], STATUS_REMOVED, STATUS_CHANGED),
        )
        return pa.table(
            {
                "k": pa.array(uk[keep].astype(np.int64)),
                "status": pa.array(status.astype(object), type=pa.string()),
            }
        )

    return (
        old.map_batches(side_map(0), batch_format="pyarrow")
        .union(new.map_batches(side_map(1), batch_format="pyarrow"))
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )

"""Dedup evaluation metrics — pair-set precision/recall at scale.

The engine's own QA tool: given a PREDICTED duplicate-pair set and a
GOLD pair set (each a Dataset of (id_a, id_b) with id_a < id_b), compute
tp/fp/fn and precision/recall WITHOUT materializing either set on the
driver.  This is the measurement behind the repo's recall >= 0.99
obligation (BASELINE.json), exposed as a first-class operator so any
blocking/verify configuration can be scored against any reference
labeling on the full corpus, not a sampled fixture.

Physical plan: each side maps pairs to one composite int64 key
(id_a * 2^31 + id_b — ids must be < 2^31; assert loudly, don't wrap),
pre-dedups per batch, and meets the other side in ONE key%P exchange.
The kernel counts per-partition tp/fp/fn from side flags (a pair lands
in exactly one partition, so partials sum exactly); the final merge is
O(P) rows.  Precision/recall are single divisions of exact int64 counts
— bit-identical across engines.

Companion: pairs_by_key emits all within-group pairs of a grouping key
(the classic "pairs from blocks" step) with a per-group cap + truncation
flag — the same discipline as the LSH bucket pair emission.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

EVAL_PARTITIONS = 32
_ID_LIMIT = np.int64(1) << np.int64(31)


def pairs_by_key(
    ds: ray.data.Dataset,
    *,
    key: str,
    id_col: str,
    partitions: int = EVAL_PARTITIONS,
    group_cap: int = 1_000,
) -> ray.data.Dataset:
    """All (id_a < id_b) pairs of rows sharing ``key`` (an int64 block
    key) -> (id_a, id_b).  Groups larger than ``group_cap`` contribute
    only their first ``group_cap`` ids (sorted) — capped with the same
    truncation discipline as the LSH hot-bucket path (the default bounds
    any one group to ~500k emitted pairs)."""

    def add_part(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "k": pa.array(k),
                "i": batch[id_col].cast(pa.int64()),
                "part": pa.array(k % partitions),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.nulls(0, pa.int64()),
                "id_b": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "k" not in group.column_names:
            return empty
        k = group["k"].to_numpy(zero_copy_only=False)
        i = group["i"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, k))
        ks, isrt = k[order], i[order]
        new_seg = np.concatenate(([True], ks[1:] != ks[:-1]))
        starts = np.flatnonzero(new_seg)
        lens = np.diff(np.concatenate((starts, [ks.shape[0]])))
        a_out: list[np.ndarray] = []
        b_out: list[np.ndarray] = []
        for s, ln in zip(starts, lens):  # per BLOCK, not per row
            if ln < 2:
                continue
            seg = isrt[s : s + ln]  # sorted by id within the block
            seg = seg[np.concatenate(([True], seg[1:] != seg[:-1]))]
            ids = seg[:group_cap]  # dedup BEFORE the cap: no (x,x) or
            n = ids.shape[0]  # duplicate pairs from repeated ids
            if n < 2:
                continue
            iu = np.triu_indices(n, k=1)
            a_out.append(ids[iu[0]])
            b_out.append(ids[iu[1]])
        if not a_out:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(a_out)),
                "id_b": pa.array(np.concatenate(b_out)),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def pair_set_metrics(
    pred: ray.data.Dataset,
    gold: ray.data.Dataset,
    *,
    partitions: int = EVAL_PARTITIONS,
) -> pa.Table:
    """One row: (n_pred, n_gold, tp, fp, fn, precision, recall).
    Both inputs are (id_a, id_b) datasets with id_a < id_b; duplicates
    within a side are deduped (set semantics)."""

    def side_map(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            a = batch["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b = batch["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
            if a.size and (
                a.max() >= _ID_LIMIT
                or b.max() >= _ID_LIMIT
                or a.min() < 0
                or b.min() < 0
            ):
                raise ValueError(
                    "pair ids must be in [0, 2^31) for the composite key"
                )
            key = np.unique(a * _ID_LIMIT + b)
            return pa.table(
                {
                    "pk": pa.array(key),
                    "side": pa.array(
                        np.full(key.shape[0], side, dtype=np.int64)
                    ),
                    "part": pa.array(key % partitions),
                }
            )

        return fn

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "tp": pa.nulls(0, pa.int64()),
                "fp": pa.nulls(0, pa.int64()),
                "fn": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "pk" not in group.column_names:
            return empty
        pk = group["pk"].to_numpy(zero_copy_only=False)
        side = group["side"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(pk, return_inverse=True)
        inpred = np.zeros(uk.shape[0], dtype=bool)
        ingold = np.zeros(uk.shape[0], dtype=bool)
        pm = side == 0
        inpred[inv[pm]] = True
        ingold[inv[~pm]] = True
        return pa.table(
            {
                "tp": pa.array([int((inpred & ingold).sum())], type=pa.int64()),
                "fp": pa.array([int((inpred & ~ingold).sum())], type=pa.int64()),
                "fn": pa.array([int((~inpred & ingold).sum())], type=pa.int64()),
            }
        )

    partials = (
        pred.map_batches(side_map(0), batch_format="pyarrow")
        .union(gold.map_batches(side_map(1), batch_format="pyarrow"))
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .to_pandas()
    )
    tp = int(partials.tp.sum()) if len(partials) else 0
    fp = int(partials.fp.sum()) if len(partials) else 0
    fn = int(partials.fn.sum()) if len(partials) else 0
    n_pred, n_gold = tp + fp, tp + fn
    return pa.table(
        {
            "n_pred": pa.array([n_pred], type=pa.int64()),
            "n_gold": pa.array([n_gold], type=pa.int64()),
            "tp": pa.array([tp], type=pa.int64()),
            "fp": pa.array([fp], type=pa.int64()),
            "fn": pa.array([fn], type=pa.int64()),
            "precision": pa.array(
                [tp / n_pred if n_pred else 1.0], type=pa.float64()
            ),
            "recall": pa.array(
                [tp / n_gold if n_gold else 1.0], type=pa.float64()
            ),
        }
    )

"""Distributed BPE tokenizer training — byte-level, exact.

The canonical tokenizer-construction step of an LLM data pipeline: learn
the top-R byte-pair merges of a corpus (Sennrich et al. 2016), then apply
them corpus-wide.  The reference's analog is its trained address-parser
vocabulary (address_parser train pipeline: corpus-wide token statistics
feeding a model artifact).

Training is EXACT over the training set, not heuristic: every round
counts all adjacent pairs and takes the global argmax with a total
deterministic tie-break (count DESC, then (left, right) ASC) — the test
suite pins the merge sequence against a naive single-process reference.

Physical plan per round (R rounds, serial by nature — each merge changes
the next round's pair distribution):

  * pair counting: per batch, ONE vectorized pass over the flat token
    array (doc-crossing pairs masked via offsets); np.unique partials
    keyed a*2^21+b -> a remote-task gather sums them (exchange volume is
    bounded by DISTINCT pairs, never corpus size).
  * merge application: greedy leftmost-non-overlapping replacement,
    vectorized (match run-length parity resolves aaa-style overlap
    chains); one map_batches over the materialized token sequences.

BPE trainers are conventionally fit on a SAMPLE (the merge ranking
stabilizes long before the full corpus is seen); ``sample_mod`` keeps
every round's passes over a deterministic hash sample while the learned
merges apply to the full corpus.  At 100 TB: sample-bounded training
state, broadcast merge table, streaming application pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

PAIR_BASE = np.int64(1) << np.int64(21)  # pair key = left * 2^21 + right


def _flat_tokens(batch: pa.Table, col: str) -> tuple[np.ndarray, np.ndarray]:
    """(flat int32 token array, int64 offsets) from a list<int32> column.
    Offsets are rebased to 0: a SLICED ListArray (Ray re-blocks freely)
    reports raw offsets into the unsliced child while flatten() returns
    only this slice's values."""
    arr = batch[col].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.int32)
    offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, offs - offs[0]


def _pair_counts(flat: np.ndarray, offs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Distinct adjacent-pair keys + counts, doc-crossing pairs excluded."""
    n = flat.shape[0]
    if n < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    a = flat[:-1].astype(np.int64)
    b = flat[1:].astype(np.int64)
    pos = np.arange(n - 1, dtype=np.int64)
    # pair at position p is within-doc iff p+1 is not a doc start
    doc_of = np.searchsorted(offs, pos, side="right") - 1
    valid = pos + 1 < offs[doc_of + 1]
    key = a[valid] * PAIR_BASE + b[valid]
    u, c = np.unique(key, return_counts=True)
    return u, c.astype(np.int64)


def _apply_merge(
    flat: np.ndarray, offs: np.ndarray, left: int, right: int, new_id: int
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy leftmost non-overlapping replacement of (left,right) ->
    new_id, vectorized; returns new (flat, offs)."""
    n = flat.shape[0]
    if n < 2:
        return flat, offs
    match = (flat[:-1] == left) & (flat[1:] == right)
    pos = np.arange(n - 1, dtype=np.int64)
    doc_of = np.searchsorted(offs, pos, side="right") - 1
    match &= pos + 1 < offs[doc_of + 1]
    idx = np.flatnonzero(match)
    if idx.shape[0] == 0:
        return flat, offs
    # resolve overlap chains (e.g. aaa with merge (a,a)): within each run
    # of CONSECUTIVE match positions keep every other one from the start
    run_start = np.concatenate(([True], np.diff(idx) != 1))
    run_id = np.cumsum(run_start) - 1
    first_of_run = idx[run_start]
    keep = ((idx - first_of_run[run_id]) % 2) == 0
    sel = idx[keep]
    # build output: copy flat, write new_id at sel, delete sel+1
    out = flat.copy()
    out[sel] = np.int32(new_id)
    delete = np.zeros(n, dtype=bool)
    delete[sel + 1] = True
    new_flat = out[~delete]
    # new offsets: each doc shrinks by its number of selected merges
    doc_sel = np.searchsorted(offs, sel, side="right") - 1
    shrink = np.bincount(doc_sel, minlength=offs.shape[0] - 1)
    new_offs = offs.copy()
    new_offs[1:] -= np.cumsum(shrink)
    return new_flat, new_offs


def train_bpe(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 32,
    sample_mod: int = 1,
) -> pa.Table:
    """Learn ``n_merges`` byte-pair merges -> table (rank, left, right,
    new_id, count).  ``sample_mod`` > 1 trains on the deterministic
    doc_id % sample_mod == 0 hash sample."""

    def to_tokens(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ids % sample_mod == 0
        sub = batch.filter(pa.array(keep))
        toks = [
            np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.int32)
            for t in sub[text_col].to_pylist()
        ]
        return pa.table(
            {
                "tokens": pa.array(
                    [t.tolist() for t in toks], type=pa.list_(pa.int32())
                )
            }
        )

    tokens = ds.map_batches(to_tokens, batch_format="pyarrow").materialize()

    @ray.remote
    def gather(*blocks):
        acc: dict[int, int] = {}
        keys_all, cnts_all = [], []
        for b in blocks:
            if b.num_rows == 0 or "k" not in b.column_names:
                continue
            keys_all.append(b.column("k").to_numpy(zero_copy_only=False))
            cnts_all.append(b.column("c").to_numpy(zero_copy_only=False))
        if not keys_all:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        k = np.concatenate(keys_all)
        c = np.concatenate(cnts_all)
        u, inv = np.unique(k, return_inverse=True)
        tot = np.zeros(u.shape[0], dtype=np.int64)
        np.add.at(tot, inv, c)
        return u, tot

    merges: list[tuple[int, int, int, int, int]] = []
    next_id = 256
    for rank in range(n_merges):
        def partial(batch: pa.Table) -> pa.Table:
            flat, offs = _flat_tokens(batch, "tokens")
            u, c = _pair_counts(flat, offs)
            return pa.table({"k": pa.array(u), "c": pa.array(c)})

        parts = tokens.map_batches(partial, batch_format="pyarrow")
        keys, counts = ray.get(gather.remote(*parts.materialize().to_arrow_refs()))
        if keys.shape[0] == 0:
            break
        # deterministic argmax: count DESC, then pair key ASC
        best_count = counts.max()
        cand = keys[counts == best_count]
        bk = int(cand.min())
        left, right = bk // int(PAIR_BASE), bk % int(PAIR_BASE)
        merges.append((rank, left, right, next_id, int(best_count)))

        l_, r_, nid = left, right, next_id

        def apply(batch: pa.Table) -> pa.Table:
            flat, offs = _flat_tokens(batch, "tokens")
            nf, no = _apply_merge(flat, offs, l_, r_, nid)
            lens = np.diff(no)
            out = [
                nf[no[i] : no[i + 1]].tolist() for i in range(lens.shape[0])
            ]
            return pa.table({"tokens": pa.array(out, type=pa.list_(pa.int32()))})

        tokens = tokens.map_batches(apply, batch_format="pyarrow").materialize()
        next_id += 1

    return pa.table(
        {
            "rank": pa.array([m[0] for m in merges], type=pa.int64()),
            "left": pa.array([m[1] for m in merges], type=pa.int64()),
            "right": pa.array([m[2] for m in merges], type=pa.int64()),
            "new_id": pa.array([m[3] for m in merges], type=pa.int64()),
            "count": pa.array([m[4] for m in merges], type=pa.int64()),
        }
    )


def bpe_encode_counts(
    ds: ray.data.Dataset,
    merges: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Apply a learned merge table corpus-wide -> (doc_id, n_bytes,
    n_tokens) per doc: the compression measurement (streaming pass, merge
    table broadcast by closure capture — it is tiny)."""
    mlist = [
        (int(l), int(r), int(n))
        for l, r, n in zip(
            merges.column("left").to_pylist(),
            merges.column("right").to_pylist(),
            merges.column("new_id").to_pylist(),
        )
    ]

    def encode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        raw = [t.encode() for t in batch[text_col].to_pylist()]
        flat = (
            np.concatenate(
                [np.frombuffer(b, dtype=np.uint8).astype(np.int32) for b in raw]
            )
            if raw
            else np.empty(0, np.int32)
        )
        offs = np.concatenate(([0], np.cumsum([len(b) for b in raw]))).astype(
            np.int64
        )
        n_bytes = np.diff(offs)
        for l_, r_, nid in mlist:
            flat, offs = _apply_merge(flat, offs, l_, r_, nid)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_bytes": pa.array(n_bytes.astype(np.int64)),
                "n_tokens": pa.array(np.diff(offs).astype(np.int64)),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")

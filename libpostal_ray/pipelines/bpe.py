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
    chains).  Chosen merges accumulate in a PENDING list that the
    counting pass replays in-kernel; the token dataset itself is only
    re-materialized every BPE_REMAT_EVERY rounds (ceil(R/k)+1 total
    materializations instead of R), and the list<int32> column is
    rebuilt with ListArray.from_arrays — no per-row Python loop.

BPE trainers are conventionally fit on a SAMPLE (the merge ranking
stabilizes long before the full corpus is seen); ``sample_mod`` keeps
every round's passes over a deterministic hash sample while the learned
merges apply to the full corpus.  At 100 TB: sample-bounded training
state, broadcast merge table, streaming application pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

PAIR_BASE = np.int64(1) << np.int64(21)  # pair key = left * 2^21 + right
# Bake pending merges into the stored token dataset only every k rounds:
# token-dataset materializations per training run = ceil(n_merges / k) + 1
# (the counting pass re-applies the <= k un-baked merges in-kernel, which
# is a handful of vectorized passes — far cheaper than a materialize).
BPE_REMAT_EVERY = 8


def _utf8_tokens(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat int32 byte-token array, int64 offsets) of a string column.
    NULL rows tokenize as empty — the same convention as diff.py's
    _digest_halves (null == empty string), applied consistently here.
    Fully vectorized: one buffer walk, no per-row encode loop."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    if not chunks:
        return np.empty(0, np.int32), np.zeros(1, np.int64)
    # concat_arrays compacts sliced inputs (offset rebased, buffer trimmed)
    arr = pa.concat_arrays([c.cast(pa.large_string()) for c in chunks])
    if arr.null_count:
        arr = pa.concat_arrays([pc.fill_null(arr, "")])
    n = len(arr)
    buf = arr.buffers()
    off = np.frombuffer(
        buf[1], dtype=np.int64, count=n + 1, offset=arr.offset * 8
    ).astype(np.int64)
    data = (
        np.frombuffer(buf[2], dtype=np.uint8)
        if buf[2] is not None
        else np.zeros(0, np.uint8)
    )
    flat = data[off[0] : off[-1]].astype(np.int32)
    return flat, off - off[0]


def _list_col(flat: np.ndarray, offs: np.ndarray) -> pa.ListArray:
    """list<int32> column from (flat, offsets) — vectorized, no tolist."""
    return pa.ListArray.from_arrays(
        pa.array(offs.astype(np.int32), type=pa.int32()),
        pa.array(flat.astype(np.int32), type=pa.int32()),
    )


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
        flat, offs = _utf8_tokens(sub[text_col])
        return pa.table({"tokens": _list_col(flat, offs)})

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
    # merges chosen but not yet baked into the stored token dataset; the
    # counting pass replays them in-kernel (<= BPE_REMAT_EVERY vectorized
    # passes per batch) so the dataset re-materializes only every k rounds
    pending: list[tuple[int, int, int]] = []
    next_id = 256
    for rank in range(n_merges):
        pend = list(pending)

        def partial(batch: pa.Table, _pend=pend) -> pa.Table:
            flat, offs = _flat_tokens(batch, "tokens")
            for pl, pr, pn in _pend:
                flat, offs = _apply_merge(flat, offs, pl, pr, pn)
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
        pending.append((left, right, next_id))
        next_id += 1

        if len(pending) >= BPE_REMAT_EVERY:
            bake = list(pending)

            def apply_all(batch: pa.Table, _bake=bake) -> pa.Table:
                flat, offs = _flat_tokens(batch, "tokens")
                for pl, pr, pn in _bake:
                    flat, offs = _apply_merge(flat, offs, pl, pr, pn)
                return pa.table({"tokens": _list_col(flat, offs)})

            tokens = tokens.map_batches(
                apply_all, batch_format="pyarrow"
            ).materialize()
            pending = []

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
        flat, offs = _utf8_tokens(batch[text_col])  # NULL -> empty, like diff
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

"""Greedy maximum-coverage data selection — the coreset / data-pruning
operator of the LLM-pipeline slate: pick k documents that together cover
as many distinct features (word shingles here) as possible.  Greedy is
the classic (1 - 1/e)-approximation for max coverage (Nemhauser et al.,
public result), and — crucially for testing — it is DETERMINISTIC given
a total tie-break order, so the distributed plan can be pinned exactly
against an independent sequential reference.

Physical plan per round (k rounds total; the graph-family ObjectRef
discipline — the covered-set never lands on the driver):

  * the covered feature-hash set (sorted int64) broadcasts by ref;
  * doc batches stream a stateless map: per-doc marginal coverage
    |features(doc) \\ covered| vectorized via searchsorted; each batch
    emits ONE candidate row — its best (marginal, doc_id) — plus that
    candidate's feature hashes (bounded by one doc's size, not the
    corpus);
  * a gather task picks the global winner (max marginal, tie -> smaller
    doc_id), merges its features into the covered set, and hands the new
    set straight to the next round's broadcast (num_returns=2: the
    scalar winner row is the only thing the driver reads).

Exchange per round = one skinny row per BATCH + one doc's features —
independent of corpus size.  Rounds are k sequential passes; the stream
re-reads the (materialized) feature table each round.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

_MASK63 = np.uint64((1 << 63) - 1)
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _mix64(z: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = (z + _GOLD) * np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _doc_feature_hashes(text: str, k: int) -> np.ndarray:
    """Distinct word-k-gram hashes of one doc (63-bit, sorted)."""
    toks = (text or "").split()
    if len(toks) < k:
        return np.empty(0, dtype=np.int64)
    grams = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    import zlib

    h = np.fromiter(
        (zlib.crc32(g.encode()) for g in grams), dtype=np.uint64, count=len(grams)
    )
    return np.unique((_mix64(h) & _MASK63).astype(np.int64))


def coverage_select(
    docs: ray.data.Dataset,
    *,
    k: int = 10,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Greedy max-coverage selection of ``k`` docs.  Returns a pyarrow
    Table (rank, doc_id, marginal, covered_total) — k rows, the greedy
    order with each pick's marginal gain and the running union size."""
    feat = docs.map_batches(
        _featurize(id_col, text_col, shingle_k), batch_format="pyarrow"
    ).materialize()
    feat_refs = feat.to_arrow_refs()

    covered_ref = ray.put(np.empty(0, dtype=np.int64))
    rows = []

    @ray.remote(num_returns=2)
    def _pick(covered: np.ndarray, *cands: pa.Table):
        best_doc, best_marg, best_feats = -1, -1, None
        for c in cands:
            if c.num_rows == 0 or "doc_id" not in c.column_names:
                continue
            d = c["doc_id"].to_numpy(zero_copy_only=False)
            m = c["marginal"].to_numpy(zero_copy_only=False)
            for i in range(c.num_rows):
                if m[i] > best_marg or (
                    m[i] == best_marg and d[i] < best_doc
                ):
                    best_doc, best_marg = int(d[i]), int(m[i])
                    best_feats = np.asarray(
                        c["feats"][i].as_py(), dtype=np.int64
                    )
        if best_doc < 0 or best_marg <= 0:
            return (-1, 0, covered.shape[0]), covered
        new_covered = np.union1d(covered, best_feats)
        return (best_doc, best_marg, new_covered.shape[0]), new_covered

    for r in range(k):
        cand_refs = (
            ray.data.from_arrow_refs(feat_refs)
            .map_batches(_marginals(covered_ref), batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        info_ref, covered_ref = _pick.remote(covered_ref, *cand_refs)
        doc, marg, tot = ray.get(info_ref)  # one scalar triple per round
        if doc < 0:
            break  # corpus exhausted: every remaining doc adds nothing
        rows.append((r, doc, marg, tot))

    return pa.table(
        {
            "rank": pa.array([r[0] for r in rows], type=pa.int64()),
            "doc_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "marginal": pa.array([r[2] for r in rows], type=pa.int64()),
            "covered_total": pa.array([r[3] for r in rows], type=pa.int64()),
        }
    )


def _featurize(id_col: str, text_col: str, shingle_k: int):
    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.nulls(0, pa.int64()),
                "feats": pa.nulls(0, pa.list_(pa.int64())),
            }
        )
        if batch.num_rows == 0 or id_col not in batch.column_names:
            return empty
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        feats = [
            _doc_feature_hashes(t, shingle_k)
            for t in batch[text_col].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "feats": pa.array(
                    [f.tolist() for f in feats], type=pa.list_(pa.int64())
                ),
            }
        )

    return fn


def _marginals(covered_ref):
    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.nulls(0, pa.int64()),
                "marginal": pa.nulls(0, pa.int64()),
                "feats": pa.nulls(0, pa.list_(pa.int64())),
            }
        )
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return empty
        covered = ray.get(covered_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        # vectorized over the WHOLE batch: flatten the list column (the
        # bpe._flat_tokens discipline — rebase offsets, sliced blocks
        # index the unsliced child) and bincount uncovered hits per doc
        arr = batch["feats"].combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        lens = np.diff(offs)
        if covered.shape[0] and flat.shape[0]:
            pos = np.minimum(
                np.searchsorted(covered, flat), covered.shape[0] - 1
            )
            unc = covered[pos] != flat
        else:
            unc = np.ones(flat.shape[0], dtype=bool)
        seg = np.repeat(np.arange(ids.shape[0], dtype=np.int64), lens)
        marg = np.bincount(
            seg[unc], minlength=ids.shape[0]
        ).astype(np.int64)
        # batch argmax under (max marginal, min doc_id)
        best = np.lexsort((ids, -marg))[0]
        if marg[best] <= 0 and ids.shape[0] == 0:
            return empty
        f = flat[offs[best] : offs[best + 1]]
        return pa.table(
            {
                "doc_id": pa.array([int(ids[best])], type=pa.int64()),
                "marginal": pa.array([int(marg[best])], type=pa.int64()),
                "feats": pa.array([f.tolist()], type=pa.list_(pa.int64())),
            }
        )

    return fn

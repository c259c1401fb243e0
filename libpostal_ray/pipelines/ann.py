"""Similarity search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once via
``ray.put`` and each map_batches task scores its batch against it with one
float64 matmul (never re-shipped per batch, never a shuffle).

Scale path: LSH-bucketed variant — random-hyperplane signs bucket the corpus;
queries probe only their own bucket (and neighbors via multi-probe).  The
hyperplanes come from the config seed: deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(batch.num_rows, -1)


class BruteForceTopK:
    """Actor: holds the broadcast query matrix; scores batches against it.

    Emits (vec_id, query_id, cos_sim) rows for the per-query top-k within the
    batch; a final small groupby-topk merges batch-local winners.
    """

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref)
        self.qids = q["query_id"]
        self.qm = q["matrix"]  # (q, d) float64, pre-normalized
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch, "embedding")
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        scores = self.qm @ m.T  # (q, n)
        k = min(self.k, m.shape[0])
        idx = np.argpartition(-scores, kth=k - 1, axis=1)[:, :k]
        rows_q = np.repeat(self.qids, k)
        rows_v = batch["vec_id"].to_numpy(zero_copy_only=False)[idx.reshape(-1)]
        rows_s = np.take_along_axis(scores, idx, axis=1).reshape(-1)
        return pa.table(
            {
                "query_id": pa.array(rows_q, type=pa.int64()),
                "vec_id": pa.array(rows_v, type=pa.int64()),
                "cos_sim": pa.array(rows_s, type=pa.float64()),
            }
        )


def brute_force_topk(
    embeddings: ray.data.Dataset,
    query_matrix: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
) -> ray.data.Dataset:
    """Top-k cosine neighbors of each query row over the embedding dataset."""
    qm = np.asarray(query_matrix, dtype=np.float64)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
    ref = ray.put({"query_id": np.asarray(query_ids, dtype=np.int64), "matrix": qm})

    scored = embeddings.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
        zero_copy_batch=True,
    )

    # merge batch-local top-k -> global top-k per query (tiny data from here)
    def merge(group: pa.Table) -> pa.Table:
        s = group["cos_sim"].to_numpy(zero_copy_only=False)
        # deterministic tie-break: score desc, then vec_id asc
        v = group["vec_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -s))[:k]
        t = group.take(pa.array(order))
        return t.append_column(
            "rank", pa.array(np.arange(1, len(order) + 1, dtype=np.int64))
        )

    return scored.groupby("query_id").map_groups(merge, batch_format="pyarrow")


class HyperplaneLSHBucketer:
    """Scale path: sign(random hyperplane . x) bits -> bucket key. Probing a
    query's bucket reduces the scored corpus by ~2^bits; seeds fixed."""

    def __init__(self, dim: int, bits: int = 8, seed: int = 0x5EED0001):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, bits))

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch, "embedding")
        signs = (m @ self.planes) > 0  # (n, bits)
        key = np.zeros(m.shape[0], dtype=np.int64)
        for j in range(signs.shape[1]):
            key |= signs[:, j].astype(np.int64) << j
        return batch.append_column("ann_bucket", pa.array(key, type=pa.int64()))


def bucketed_topk(
    embeddings: ray.data.Dataset,
    query_matrix: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    bits: int = 8,
    seed: int = 0x5EED0001,
) -> ray.data.Dataset:
    """IVF/LSH-style ANN: bucket corpus by hyperplane signs, score each query
    only against its own bucket. Approximate (documented recall tradeoff)."""
    dim = np.asarray(query_matrix).shape[1]
    bucketer = HyperplaneLSHBucketer(dim, bits=bits, seed=seed)
    bucketed = embeddings.map_batches(
        HyperplaneLSHBucketer,
        fn_constructor_kwargs={"dim": dim, "bits": bits, "seed": seed},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )
    qm = np.asarray(query_matrix, dtype=np.float64)
    q_keys = bucketer(
        pa.table({"embedding": pa.array([list(r) for r in qm]), "vec_id": pa.array(query_ids)})
    )["ann_bucket"].to_numpy(zero_copy_only=False)
    q_by_bucket: dict[int, list[int]] = {}
    for qi, bk in enumerate(q_keys):
        q_by_bucket.setdefault(int(bk), []).append(qi)
    ref = ray.put(
        {
            "q_by_bucket": q_by_bucket,
            "query_id": np.asarray(query_ids, dtype=np.int64),
            "matrix": qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30),
            "k": k,
        }
    )

    def score_bucket(group: pa.Table) -> pa.Table:
        state = ray.get(ref)
        bucket = int(group["ann_bucket"][0].as_py())
        qidx = state["q_by_bucket"].get(bucket, [])
        if not qidx:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "cos_sim": pa.array([], type=pa.float64()),
                    "rank": pa.array([], type=pa.int64()),
                }
            )
        m = _emb_matrix(group, "embedding")
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        qm_b = state["matrix"][qidx]
        scores = qm_b @ m.T
        vids = group["vec_id"].to_numpy(zero_copy_only=False)
        out_q, out_v, out_s, out_r = [], [], [], []
        kk = min(state["k"], m.shape[0])
        for row, qi in enumerate(qidx):
            order = np.lexsort((vids, -scores[row]))[:kk]
            out_q.extend([state["query_id"][qi]] * len(order))
            out_v.extend(vids[order])
            out_s.extend(scores[row][order])
            out_r.extend(range(1, len(order) + 1))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "cos_sim": pa.array(out_s, type=pa.float64()),
                "rank": pa.array(out_r, type=pa.int64()),
            }
        )

    return bucketed.groupby("ann_bucket").map_groups(score_bucket, batch_format="pyarrow")

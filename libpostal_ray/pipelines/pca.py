"""Distributed second moments + PCA over an embedding column.

The scale path for similarity search (SURVEY §2: ANN / embedding dedup)
sometimes needs a LEARNED rotation first — PCA whitening before
quantization (the OPQ/IVF-PCA family).  Both stages here follow the
engine's vector-aggregate discipline (label_centroids): per-batch
partials of fixed size O(d^2), one tiny gather, broadcast back.

Determinism rule: second moments are integerized PER ROW
(floor(v_i*v_j*1e6) summed as int64), so the reduction is associative
and the result is bit-identical under any Ray block layout — the same
fix the kmeans_fit flake needed.  The d x d matrix never depends on
float summation order; eigh runs once on the driver-side gathered
matrix (O(d^3), d is small by contract).

At 100 TB: each batch ships 8*(d^2+d) bytes of partials regardless of
row count; the projection pass is stateless map_batches with the
(d x k) component matrix broadcast once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

MICRO = 1_000_000.0
CHUNK_ROWS = 64  # cache-block the (rows, d, d) outer-product temporary


def _stack(col: pa.ChunkedArray) -> np.ndarray:
    """(n, d) float64 zero-copy-ish view of a list<float> column."""
    arrs = []
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    for c in chunks:
        if len(c) == 0:
            continue
        flat = c.flatten().to_numpy(zero_copy_only=False)
        arrs.append(flat.reshape(len(c), -1))
    if not arrs:
        return np.zeros((0, 0))
    return np.concatenate(arrs).astype(np.float64)


def second_moments(
    ds: ray.data.Dataset,
    *,
    embedding_col: str = "embedding",
) -> "ray.ObjectRef":
    """ObjectRef of (n_rows, sum_micro[d], moment_micro[d,d]) — exact
    int64 per-row-integerized first and second moments of the corpus."""

    def partial(batch: pa.Table) -> pa.Table:
        e = _stack(batch[embedding_col])
        n, d = e.shape
        if n == 0:
            return pa.table(
                {
                    "n": pa.array([0], type=pa.int64()),
                    "payload": pa.array([b""], type=pa.large_binary()),
                }
            )
        s = np.floor(e * MICRO).astype(np.int64).sum(axis=0)
        m = np.zeros((d, d), dtype=np.int64)
        for lo in range(0, n, CHUNK_ROWS):
            sub = e[lo : lo + CHUNK_ROWS]
            outer = sub[:, :, None] * sub[:, None, :]
            m += np.floor(outer * MICRO).astype(np.int64).sum(axis=0)
        payload = np.concatenate((s, m.ravel())).tobytes()
        return pa.table(
            {
                "n": pa.array([n], type=pa.int64()),
                "payload": pa.array([payload], type=pa.large_binary()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")

    @ray.remote
    def gather(*blocks: pa.Table):
        total_n = 0
        acc: np.ndarray | None = None
        for b in blocks:
            if b.num_rows == 0 or "payload" not in b.column_names:
                continue
            for i in range(b.num_rows):
                raw = b.column("payload")[i].as_py()
                if not raw:
                    continue
                v = np.frombuffer(raw, dtype=np.int64)
                acc = v.copy() if acc is None else acc + v
                total_n += b.column("n")[i].as_py()
        if acc is None:
            return 0, np.zeros(0, np.int64), np.zeros((0, 0), np.int64)
        # payload length = d + d^2 -> d = positive root of d^2 + d - L
        length = acc.shape[0]
        d = int((-1 + np.sqrt(1 + 4 * length)) / 2)
        return total_n, acc[:d], acc[d:].reshape(d, d)

    return gather.remote(*parts.materialize().to_arrow_refs())


def pca_fit(moments_ref: "ray.ObjectRef", k: int) -> "ray.ObjectRef":
    """Top-k principal components from the gathered exact moments.
    Covariance = M/n - mean mean^T (micro-scaled); eigh is deterministic
    on the integer-derived matrix, and each component's sign is fixed by
    making its largest-|.| coordinate positive."""

    @ray.remote
    def fit(mom) -> np.ndarray:
        n, s, m = mom
        if n == 0:
            return np.zeros((0, k))
        mean = s.astype(np.float64) / (n * MICRO)
        cov = m.astype(np.float64) / (n * MICRO) - np.outer(mean, mean)
        w, v = np.linalg.eigh(cov)
        comps = v[:, np.argsort(w)[::-1][:k]]  # (d, k), descending variance
        flip = np.abs(comps).argmax(axis=0)
        sign = np.sign(comps[flip, np.arange(comps.shape[1])])
        sign[sign == 0] = 1.0
        return comps * sign

    return fit.remote(moments_ref)


def pca_project(
    ds: ray.data.Dataset,
    components_ref: "ray.ObjectRef",
    moments_ref: "ray.ObjectRef",
    *,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> ray.data.Dataset:
    """(id, pc_0..pc_{k-1}) — centered projection onto the broadcast
    components; stateless per-batch matmul."""

    def project(batch: pa.Table) -> pa.Table:
        comps = ray.get(components_ref)
        n_total, s, _ = ray.get(moments_ref)
        e = _stack(batch[embedding_col])
        mean = s.astype(np.float64) / (n_total * MICRO) if n_total else 0.0
        proj = (e - mean) @ comps
        cols = {id_col: batch[id_col]}
        for j in range(comps.shape[1]):
            cols[f"pc_{j}"] = pa.array(proj[:, j], type=pa.float64())
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")

"""SemDeDup: semantic deduplication over an embedding column.

The published web-scale recipe (Abbas et al. 2023, "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication"):
k-means partition the embedding space, then WITHIN each cluster call pairs
with cosine >= eps semantic duplicates, connect them into dup groups, and
keep exactly one representative per group — the member with the LOWEST
cosine similarity to its cluster centroid (the paper's choice: the most
atypical member survives, preserving diversity near cluster boundaries).

This is the embedding-space sibling of the MinHash flagship: where MinHash
finds *textual* near-dups, SemDeDup finds *meaning-level* dups (retold
stories, translated boilerplate, templated rewrites) that share no
shingles.  The reference has no analog — this is a beyond-reference
training-data operator (task brief: embedding-cosine near-dup family).

Ray-Data shape (the same partitioning discipline as the near-dup
exchange):

1. ``kmeans_fit`` (pipelines/ann.py) — one map_batches pass per Lloyd
   iteration; only k x d floats per batch leave any worker.
2. one assign pass appending (sem_cluster, centroid_sim) per row.
3. ONE groupby on ``sem_cluster % P`` with a vectorized per-cluster
   segment kernel — never one Python call per cluster.
4. per-cluster all-pairs cosine is bounded by ``cluster_cap`` with
   deterministic hash-order chunking (connectivity-for-work trade, flagged
   per row via ``truncated``) — no O(N^2) block anywhere; total work is
   O(N * cluster_cap) worst case, O(sum c_i^2) typical.

At 100 TB: k scales as N / target_cluster_size so per-cluster work stays
flat; the shuffle ships one skinny row (vec_id + packed embedding +
2 int/float) per vector, once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from libpostal_ray.pipelines.ann import _emb_matrix, kmeans_fit
from libpostal_ray.pipelines.cluster import _cc_vectorized

SEMDEDUP_SCHEMA = pa.schema(
    [
        ("vec_id", pa.int64()),
        ("sem_cluster", pa.int64()),
        ("centroid_sim", pa.float64()),
        ("dup_group_size", pa.int64()),
        ("keep", pa.bool_()),
        ("truncated", pa.bool_()),
    ]
)


class _SemDedupPartition:
    """map_groups callable over a PARTITION of k-means clusters
    (sem_cluster % P): recovers per-cluster segments vectorized, runs the
    within-cluster dup-group + representative-selection kernel."""

    def __init__(self, eps: float, cluster_cap: int):
        self.eps = eps
        self.cluster_cap = cluster_cap

    def __call__(self, group: pa.Table) -> pa.Table:
        from libpostal_ray.functions.hashing import mix_fold_u64

        n = group.num_rows
        if n == 0:
            return SEMDEDUP_SCHEMA.empty_table()
        cids = group["sem_cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = group["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        csim = group["centroid_sim"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, cids))
        cids_s, ids_s, csim_s = cids[order], ids[order], csim[order]
        # float32 is plenty for an eps comparison (quantization ~1e-7) and
        # halves the pairwise-block DRAM traffic on this bandwidth-starved
        # host
        m = _emb_matrix(group.take(pa.array(order)), "embedding").astype(np.float32)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)

        group_size = np.ones(n, dtype=np.int64)
        keep = np.ones(n, dtype=bool)
        truncated = np.zeros(n, dtype=bool)

        starts = np.flatnonzero(np.concatenate(([True], cids_s[1:] != cids_s[:-1])))
        ends = np.concatenate((starts[1:], [n]))
        for st, en in zip(starts, ends):
            sz = int(en - st)
            if sz < 2:
                continue
            rows = np.arange(st, en)
            if sz > self.cluster_cap:
                # deterministic hash-order chunking of an oversized cluster
                # (same trade as the MinHash salted buckets); dup groups
                # split across chunks lose cross-chunk edges — every row of
                # the cluster is flagged so downstream can re-run with a
                # higher cap or more clusters
                truncated[rows] = True
                h = mix_fold_u64([ids_s[rows].astype(np.uint64)], salt=int(cids_s[st]))
                rows = rows[np.lexsort((ids_s[rows], h))]
            for cs in range(0, sz, self.cluster_cap):
                chunk = rows[cs : cs + self.cluster_cap]
                cm = chunk.shape[0]
                if cm < 2:
                    continue
                sims = m[chunk] @ m[chunk].T
                li, ri = np.nonzero(np.triu(sims >= self.eps, k=1))
                if li.size == 0:
                    continue
                nodes, labels = _cc_vectorized(li.astype(np.int64), ri.astype(np.int64))
                lab = np.arange(cm, dtype=np.int64)  # singletons label themselves
                lab[nodes] = labels
                # component sizes
                uniq, inv, cnt = np.unique(lab, return_inverse=True, return_counts=True)
                group_size[chunk] = cnt[inv]
                # representative = argmin centroid_sim, ties by vec_id:
                # the first row of each component under (lab, csim, vec_id)
                sel = np.lexsort((ids_s[chunk], csim_s[chunk], lab))
                lab_sorted = lab[sel]
                first = np.concatenate(([True], lab_sorted[1:] != lab_sorted[:-1]))
                k = np.zeros(cm, dtype=bool)
                k[sel[first]] = True
                keep[chunk] = k

        return pa.table(
            {
                "vec_id": pa.array(ids_s, type=pa.int64()),
                "sem_cluster": pa.array(cids_s, type=pa.int64()),
                "centroid_sim": pa.array(np.round(csim_s, 6), type=pa.float64()),
                "dup_group_size": pa.array(group_size, type=pa.int64()),
                "keep": pa.array(keep, type=pa.bool_()),
                "truncated": pa.array(truncated, type=pa.bool_()),
            },
            schema=SEMDEDUP_SCHEMA,
        )


def semantic_dedup(
    embeddings: ray.data.Dataset,
    eps: float = 0.9,
    n_clusters: int = 16,
    iters: int = 8,
    seed: int = 0x5EED0001,
    cluster_cap: int = 2048,
    partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-vector SemDeDup verdicts: (vec_id, sem_cluster, centroid_sim,
    dup_group_size, keep, truncated).

    ``keep`` is True for every vector that survives semantic dedup at
    threshold ``eps``: singletons, plus one representative (lowest
    centroid_sim, ties by vec_id) per connected dup group within its
    k-means cluster.  Deterministic for a fixed (seed, corpus).
    """
    cents = kmeans_fit(embeddings, n_clusters, iters=iters, seed=seed)
    ref = ray.put(cents)
    P = partitions if partitions is not None else max(1, min(32, n_clusters))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        mm = _emb_matrix(batch, "embedding")
        mm = mm / np.maximum(np.linalg.norm(mm, axis=1, keepdims=True), 1e-30)
        scores = mm @ c.T
        a = np.argmax(scores, axis=1).astype(np.int64)
        best = scores[np.arange(scores.shape[0]), a]
        out = batch.select(["vec_id", "embedding"])
        out = out.append_column("sem_cluster", pa.array(a, type=pa.int64()))
        out = out.append_column("centroid_sim", pa.array(best, type=pa.float64()))
        return out.append_column("part", pa.array(a % P, type=pa.int64()))

    assigned = embeddings.map_batches(assign, batch_format="pyarrow", batch_size=4096)
    kernel = _SemDedupPartition(eps, cluster_cap)

    def run_partition(group: pa.Table) -> pa.Table:
        return kernel(group)

    return (
        assigned.groupby("part")
        .map_groups(run_partition, batch_format="pyarrow")
        .select_columns(
            [
                "vec_id",
                "sem_cluster",
                "centroid_sim",
                "dup_group_size",
                "keep",
                "truncated",
            ]
        )
    )

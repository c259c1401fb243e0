"""Distributed connected components over an edge Dataset.

The reference keeps its pair graph in an in-memory CSR (`graph.h:1-46`) —
fine for one process, impossible at 10^12 files.  Here: the alternating
large-star / small-star min-label propagation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — the published pattern cited in
PAPERS.md), expressed as ``groupby().map_groups`` rounds over an edge
Dataset.  Converges in O(log n) rounds; every round is one shuffle keyed by
node id.

Determinism: min-label everywhere; the final cluster id of a component is the
minimum doc_id in it — stable across runs/retries, which the golden fixtures
and resumability both require.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_EDGE_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])


def _pairs_table(u: np.ndarray, v: np.ndarray) -> pa.Table:
    return pa.table(
        {"u": pa.array(u, type=pa.int64()), "v": pa.array(v, type=pa.int64())},
        schema=_EDGE_SCHEMA,
    )


def _large_star_group(group: pa.Table) -> pa.Table:
    """Group = all neighbors of node u (both directions).  Connect every
    strictly-larger neighbor to m = min(u, neighbors)."""
    u = group["u"][0].as_py()
    nbrs = group["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = min(int(nbrs.min()), u)
    big = nbrs[nbrs > u]
    big = np.unique(big)
    if big.shape[0] == 0:
        return _EDGE_SCHEMA.empty_table()
    return _pairs_table(big, np.full(big.shape[0], m, dtype=np.int64))


def _small_star_group(group: pa.Table) -> pa.Table:
    """Group = smaller-or-equal neighbors of node u (edges directed high->low).
    Connect u and all neighbors to m = min(neighbors)."""
    u = np.int64(group["u"][0].as_py())
    nbrs = np.unique(group["v"].to_numpy(zero_copy_only=False).astype(np.int64))
    m = nbrs.min()
    out = np.concatenate([nbrs[nbrs != m], np.array([u], dtype=np.int64)])
    out = out[out != m]
    out = np.unique(out)
    if out.shape[0] == 0:
        # u IS m's only partner already
        return _pairs_table(np.array([u], dtype=np.int64), np.array([m], dtype=np.int64)) if u != m else _EDGE_SCHEMA.empty_table()
    return _pairs_table(out, np.full(out.shape[0], m, dtype=np.int64))


def _symmetrize(batch: pa.Table) -> pa.Table:
    u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    return _pairs_table(np.concatenate([u, v]), np.concatenate([v, u]))


def _direct_high_low(batch: pa.Table) -> pa.Table:
    u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    return _pairs_table(np.maximum(u, v), np.minimum(u, v))


def _checksum(ds: ray.data.Dataset) -> tuple[int, int]:
    """(row_count, order-independent checksum) of an edge dataset."""
    from ray.data.aggregate import Sum, Count

    def add_mix(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (u * np.uint64(0x9E3779B97F4A7C15) ^ v) * np.uint64(0x100000001B3)
        # fold to int64-safe domain for the Sum aggregate
        return pa.table({"h": pa.array((h >> np.uint64(2)).astype(np.int64))})

    res = ds.map_batches(add_mix, batch_format="pyarrow").aggregate(
        Count(alias_name="n"), Sum("h", alias_name="s")
    )
    return int(res["n"]), int(res["s"] or 0)


def connected_components(
    edges: ray.data.Dataset, max_rounds: int = 30
) -> ray.data.Dataset:
    """edges (src: uint64, dst: uint64, ...) -> labels (doc_id: uint64,
    cluster_id: uint64) for every node that appears in an edge.

    cluster_id = min doc_id of the component.  Nodes not present in any edge
    are absent (callers assign label=self via a left join — see
    ``assign_clusters``).
    """
    cur = edges.map_batches(
        lambda b: _pairs_table(
            b["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
        ),
        batch_format="pyarrow",
    )
    prev_sig = None
    for _ in range(max_rounds):
        # large-star
        cur = (
            cur.map_batches(_symmetrize, batch_format="pyarrow")
            .groupby("u")
            .map_groups(_large_star_group, batch_format="pyarrow")
        )
        # small-star
        cur = (
            cur.map_batches(_direct_high_low, batch_format="pyarrow")
            .groupby("u")
            .map_groups(_small_star_group, batch_format="pyarrow")
        )
        cur = cur.materialize()
        sig = _checksum(cur)
        if sig == prev_sig:
            break
        prev_sig = sig

    # converged: star edges (node -> root). label(node)=min partner; root
    # labels itself.
    def to_labels(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.concatenate([u, v])
        lab = np.concatenate([v, v])
        return pa.table(
            {
                "doc_id": pa.array(node, type=pa.int64()),
                "cluster_id": pa.array(lab, type=pa.int64()),
            }
        )

    from ray.data.aggregate import Min

    labels = (
        cur.map_batches(to_labels, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Min("cluster_id", alias_name="cluster_id"))
    )
    return labels


def effective_join_partitions(requested: int) -> int:
    """Ray's hash-shuffle join runs one aggregator actor per partition; more
    partitions than CPUs stalls a small cluster. Clamp to the CPU count
    (on a real multi-node cluster `requested` wins)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(2, min(requested, cpus))


def assign_clusters(
    docs: ray.data.Dataset,
    labels: ray.data.Dataset,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Left join docs with labels; unlabeled docs are singletons
    (cluster_id = doc_id)."""
    joined = docs.join(
        labels,
        join_type="left_outer",
        num_partitions=effective_join_partitions(num_partitions),
        on=("doc_id",),
    )

    def fill(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cid = pc.coalesce(
            batch["cluster_id"].cast(pa.int64()), batch["doc_id"].cast(pa.int64())
        )
        return batch.set_column(
            batch.column_names.index("cluster_id"), "cluster_id", cid
        )

    return joined.map_batches(fill, batch_format="pyarrow")

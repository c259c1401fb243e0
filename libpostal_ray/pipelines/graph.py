"""Iterative graph analytics over the near-dup edge set.

The flagship emits an undirected similarity graph (edges = verified
near-dup pairs); connected components (pipelines/cluster.py) answers
"which docs are the same"; PageRank here answers "which doc is the most
CENTRAL member" — a principled representative choice for keep/drop
reports (the highest-rank member of a cluster is the one most other
members point at through high-similarity paths), and the second member of
the iterative-algorithm family (pipelines/train.py holds the first).

Physical plan per iteration (no edge shuffle at all):

  * node state (sorted node ids, out-degrees, current ranks) is built
    OFF-DRIVER in a remote task and broadcast by ref — 16 B/node, the
    same keep-set budget discipline as prepare.py (document: node state
    is the broadcast bound; past ~1e9 nodes the update becomes a
    rank-join, the edge side of the plan is unchanged);
  * edge blocks stream through a stateless map: contribution of edge
    (u, v) is rank(u)/deg(u) credited to v (and symmetrically u, the
    graph being undirected) — scatter-added into per-batch partials, so
    a batch of any size emits <= its distinct-dst count of skinny
    (node, contrib) rows;
  * ONE engine groupby(node) sums partials; the new rank vector is
    gathered off-driver and becomes the next broadcast.

Edges are read once and materialized; iterations reuse the blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


@ray.remote
def _node_state(*blocks: pa.Table) -> dict:
    """Sorted node ids + degrees from symmetrized edge blocks."""
    srcs = [
        b.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        for b in blocks
        if b.num_rows > 0 and "src" in b.column_names
    ]
    dsts = [
        b.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        for b in blocks
        if b.num_rows > 0 and "dst" in b.column_names
    ]
    if not srcs:
        return {"nodes": np.empty(0, dtype=np.int64), "deg": np.empty(0, dtype=np.int64)}
    allv = np.concatenate(srcs + dsts)
    nodes, counts = np.unique(allv, return_counts=True)
    # symmetrized multiplicity == undirected degree
    return {"nodes": nodes, "deg": counts}


@ray.remote
def _gather_ranks(nodes: np.ndarray, *blocks: pa.Table) -> np.ndarray:
    out = np.zeros(nodes.shape[0], dtype=np.float64)
    for b in blocks:
        if b.num_rows == 0 or "node" not in b.column_names:
            continue
        n = b.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        c = b.column("contrib").to_numpy(zero_copy_only=False)
        out[np.searchsorted(nodes, n)] += c
    return out


def pagerank(
    edges: ray.data.Dataset,
    *,
    iters: int = 10,
    damping: float = 0.85,
) -> ray.data.Dataset:
    """PageRank over an UNDIRECTED edge list (src, dst) — each edge
    counts both ways, so there are no dangling nodes by construction.
    Returns (doc_id, rank) summing to 1.0 over the graph's nodes;
    isolated docs (no edges) are not in the graph and score 0 by
    convention.  Deterministic: fixed iteration count, vectorized
    float64 updates in a fixed reduction order per block set."""
    edges = edges.select_columns(["src", "dst"]).materialize()
    edge_refs = edges.to_arrow_refs()
    state = ray.get(_node_state.remote(*edge_refs))
    nodes, deg = state["nodes"], state["deg"]
    n = nodes.shape[0]
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.nulls(0, pa.int64()),
                    "rank": pa.nulls(0, pa.float64()),
                }
            )
        )
    nodes_ref = ray.put(nodes)
    ranks = np.full(n, 1.0 / n, dtype=np.float64)

    for _ in range(iters):
        share_ref = ray.put(ranks / deg)  # per-node outgoing share

        def contrib(batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "node": pa.nulls(0, pa.int64()),
                    "contrib": pa.nulls(0, pa.float64()),
                }
            )
            if batch.num_rows == 0 or "src" not in batch.column_names:
                return empty
            nd = ray.get(nodes_ref)
            sh = ray.get(share_ref)
            s = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            si = np.searchsorted(nd, s)
            di = np.searchsorted(nd, d)
            # undirected: each endpoint credits the other
            touched = np.concatenate((di, si))
            credit = np.concatenate((sh[si], sh[di]))
            u, inv = np.unique(touched, return_inverse=True)
            acc = np.zeros(u.shape[0], dtype=np.float64)
            np.add.at(acc, inv, credit)
            return pa.table(
                {
                    "node": pa.array(nd[u]),
                    "contrib": pa.array(acc),
                }
            )

        # no engine groupby: _gather_ranks scatter-adds every block's
        # partials into the rank vector directly, so an extra sort-based
        # aggregate barrier per iteration buys nothing (the per-batch
        # partials are already deduplicated within a batch; across-batch
        # duplicates are just additional += terms).  At cluster scale the
        # single gather task becomes a tree reduce — same associativity
        # note as exact_global_quantile's histogram merge.
        partial_blocks = (
            edges.map_batches(contrib, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        gathered = ray.get(_gather_ranks.remote(nodes_ref, *partial_blocks))
        ranks = (1.0 - damping) / n + damping * gathered

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(nodes, type=pa.int64()),
                "rank": pa.array(ranks),
            }
        )
    )


LIST_RANK_LOCAL_MAX = 4_000_000  # 24 B/node -> <=96 MB in one task


def list_rank(
    state: ray.data.Dataset,
    max_rounds: int = 40,
    parts: int = 32,
    local_max_nodes: int = LIST_RANK_LOCAL_MAX,
) -> ray.data.Dataset:
    """Parallel LIST RANKING (Wyllie's pointer doubling): given a
    successor forest (node: int64, parent: int64; parent == node marks a
    head), compute every node's hop distance to its head and the head id
    — the classic PRAM primitive behind parallel list/tree problems,
    here as O(log chain-length) rounds of ONE co-partitioned exchange
    each (the third member of the iterative family next to
    connected_components and pagerank).

    Round invariant: rank(v) = hops from v to ptr(v); each round
    rank += rank[ptr]; ptr = ptr[ptr], halving every chain's remaining
    distance.  A round is a tagged-stream union (probe rows keyed
    ptr%P, state rows keyed node%P) + a searchsorted kernel — 32 B/node
    exchange, edges never exist as a table.  Deterministic at any block
    layout; converges when no pointer moves (all pointers at heads),
    checked with a per-round sum on the materialized state.  Raises
    after ``max_rounds`` (a 2^40-long chain) rather than looping.

    Returns (node, hops, head).

    Hybrid crossover (the near_dupe/cluster discipline): forests under
    ``local_max_nodes`` run Wyllie in ONE remote task over the gathered
    24 B/node state — same doubling loop, vectorized index form, no
    per-round engine fixed costs; larger forests run the distributed
    rounds.  Outputs are identical (the doubling recurrence is
    deterministic either way)."""

    def tag(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "node": pa.nulls(0, pa.int64()),
                "ptr": pa.nulls(0, pa.int64()),
                "rank": pa.nulls(0, pa.int64()),
                "side": pa.nulls(0, pa.int64()),
                "part": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "node" not in batch.column_names:
            return empty
        n = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch["ptr"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = batch["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(np.concatenate((n, n))),
                "ptr": pa.array(np.concatenate((p, p))),
                "rank": pa.array(np.concatenate((r, r))),
                "side": pa.array(
                    np.concatenate(
                        (np.zeros(n.shape[0], np.int64), np.ones(n.shape[0], np.int64))
                    )
                ),
                "part": pa.array(np.concatenate((p % parts, n % parts))),
            }
        )

    def jump(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "node": pa.nulls(0, pa.int64()),
                "ptr": pa.nulls(0, pa.int64()),
                "rank": pa.nulls(0, pa.int64()),
                "changed": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "side" not in group.column_names:
            return empty
        side = group["side"].to_numpy(zero_copy_only=False)
        node = group["node"].to_numpy(zero_copy_only=False)
        ptr = group["ptr"].to_numpy(zero_copy_only=False)
        rank = group["rank"].to_numpy(zero_copy_only=False)
        a = side == 0
        bn, bp, br = node[~a], ptr[~a], rank[~a]
        order = np.argsort(bn)
        bn, bp, br = bn[order], bp[order], br[order]
        an, ap, ar = node[a], ptr[a], rank[a]
        pos = np.searchsorted(bn, ap)
        # every ptr target exists as a node (closed forest) — loud check
        if pos.shape[0] and (
            pos.max(initial=-1) >= bn.shape[0] or not (bn[pos] == ap).all()
        ):
            raise ValueError("list_rank: pointer to a missing node")
        new_ptr = bp[pos]
        new_rank = ar + br[pos]
        return pa.table(
            {
                "node": pa.array(an),
                "ptr": pa.array(new_ptr),
                "rank": pa.array(new_rank),
                "changed": pa.array((new_ptr != ap).astype(np.int64)),
            }
        )

    def init(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "node": pa.nulls(0, pa.int64()),
                "ptr": pa.nulls(0, pa.int64()),
                "rank": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "node" not in batch.column_names:
            return empty
        n = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch["parent"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(n),
                "ptr": pa.array(p),
                "rank": pa.array((p != n).astype(np.int64)),
            }
        )

    cur = state.map_batches(init, batch_format="pyarrow").materialize()
    n_nodes = cur.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.nulls(0, pa.int64()),
                    "hops": pa.nulls(0, pa.int64()),
                    "head": pa.nulls(0, pa.int64()),
                }
            )
        )
    if n_nodes <= local_max_nodes:
        import ray as _ray

        @_ray.remote
        def _local(*blocks):
            parts_ = [
                b for b in blocks if b.num_rows and "node" in b.column_names
            ]
            node = np.concatenate(
                [b["node"].to_numpy(zero_copy_only=False) for b in parts_]
            )
            ptr = np.concatenate(
                [b["ptr"].to_numpy(zero_copy_only=False) for b in parts_]
            )
            rank = np.concatenate(
                [b["rank"].to_numpy(zero_copy_only=False) for b in parts_]
            )
            order = np.argsort(node)
            node, ptr, rank = node[order], ptr[order], rank[order]
            p = np.searchsorted(node, ptr)
            if p.shape[0] and (
                p.max(initial=-1) >= node.shape[0] or not (node[p] == ptr).all()
            ):
                raise ValueError("list_rank: pointer to a missing node")
            for _ in range(max_rounds):
                if (p[p] == p).all():
                    break
                rank = rank + rank[p]
                p = p[p]
            else:
                raise RuntimeError(
                    f"list_rank did not converge in {max_rounds} rounds"
                )
            return pa.table(
                {
                    "node": pa.array(node),
                    "hops": pa.array(rank),
                    "head": pa.array(node[p]),
                }
            )

        return ray.data.from_arrow_refs([_local.remote(*cur.to_arrow_refs())])
    for _ in range(max_rounds):
        nxt = (
            cur.map_batches(tag, batch_format="pyarrow")
            .groupby("part")
            .map_groups(jump, batch_format="pyarrow")
            .materialize()
        )
        moved = nxt.sum("changed") or 0
        cur = nxt.drop_columns(["changed"]).materialize()
        if moved == 0:
            return cur.map_batches(
                lambda b: b.rename_columns(["node", "head", "hops"]).select(
                    ["node", "hops", "head"]
                ),
                batch_format="pyarrow",
            )
    raise RuntimeError(f"list_rank did not converge in {max_rounds} rounds")

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


@ray.remote(num_returns=2)
def _node_state(*blocks: pa.Table):
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
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    allv = np.concatenate(srcs + dsts)
    nodes, counts = np.unique(allv, return_counts=True)
    # symmetrized multiplicity == undirected degree
    return nodes, counts


# ---- small driver-free plumbing tasks (round-5 discipline: per-node
# state NEVER lands on the driver — every round's gathered vector stays
# an ObjectRef passed straight into the next round's broadcast, and the
# driver only ever ray.get()s SCALAR convergence signals) ----


@ray.remote
def _arr_len(a: np.ndarray) -> int:
    return int(a.shape[0])


@ray.remote
def _arr_stats(a: np.ndarray):
    """(len, min, max) scalars — for id-range guards without a gather."""
    if a.shape[0] == 0:
        return 0, 0, 0
    return int(a.shape[0]), int(a.min()), int(a.max())


@ray.remote
def _copy_arr(a: np.ndarray) -> np.ndarray:
    return a.copy()


@ray.remote(num_returns=2)
def _pr_round(
    nodes: np.ndarray, deg: np.ndarray, damping: float, *blocks: pa.Table
):
    """One PageRank fold: scatter-add partial contribs, apply the
    damping affine, and emit BOTH the new rank vector and the next
    round's outgoing-share broadcast — all off-driver."""
    n = nodes.shape[0]
    out = np.zeros(n, dtype=np.float64)
    for b in blocks:
        if b.num_rows == 0 or "node" not in b.column_names:
            continue
        nn = b.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        c = b.column("contrib").to_numpy(zero_copy_only=False)
        out[np.searchsorted(nodes, nn)] += c
    ranks = (1.0 - damping) / n + damping * out
    return ranks, ranks / deg


@ray.remote
def _init_share(deg: np.ndarray, n: int) -> np.ndarray:
    return np.full(n, 1.0 / n, dtype=np.float64) / deg


@ray.remote
def _full_f64(n: int, val: float) -> np.ndarray:
    return np.full(n, val, dtype=np.float64)


@ray.remote
def _scatter_i64(
    nodes: np.ndarray, vec: np.ndarray, val_col: str, *blocks: pa.Table
) -> np.ndarray:
    """Copy the int64 node vector and scatter (node, val) update blocks
    into it — node-disjoint blocks, so application order is irrelevant."""
    out = vec.copy()
    for b in blocks:
        if b.num_rows == 0 or "node" not in b.column_names:
            continue
        nn = b["node"].to_numpy(zero_copy_only=False)
        nv = b[val_col].to_numpy(zero_copy_only=False)
        out[np.searchsorted(nodes, nn)] = nv
    return out


@ray.remote
def _concat_sort_uvw(*tables: pa.Table) -> pa.Table:
    """Concat per-round chosen-edge tables and apply the deterministic
    (w, u, v) output order — off-driver (tables arrive as refs)."""
    allt = pa.concat_tables([t for t in tables if t is not None])
    u = allt["u"].to_numpy(zero_copy_only=False)
    v = allt["v"].to_numpy(zero_copy_only=False)
    w = allt["w"].to_numpy(zero_copy_only=False)
    order = np.lexsort((v, u, w))
    return pa.table(
        {
            "u": pa.array(u[order], type=pa.int64()),
            "v": pa.array(v[order], type=pa.int64()),
            "w": pa.array(w[order], type=pa.int64()),
        }
    )


@ray.remote
def _emit_f64_table(
    nodes: np.ndarray, vec: np.ndarray, id_name: str, val_name: str
) -> pa.Table:
    return pa.table(
        {
            id_name: pa.array(nodes, type=pa.int64()),
            val_name: pa.array(vec, type=pa.float64()),
        }
    )


@ray.remote
def _emit_i64_table(
    nodes: np.ndarray, vec: np.ndarray, id_name: str, val_name: str
) -> pa.Table:
    return pa.table(
        {
            id_name: pa.array(nodes, type=pa.int64()),
            val_name: pa.array(vec, type=pa.int64()),
        }
    )


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
    nodes_ref, deg_ref = _node_state.remote(*edge_refs)
    n = ray.get(_arr_len.remote(nodes_ref))
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.nulls(0, pa.int64()),
                    "rank": pa.nulls(0, pa.float64()),
                }
            )
        )
    # per-node state stays an ObjectRef end-to-end: the share vector is
    # built off-driver, each round's _pr_round output feeds the next
    # round's broadcast directly, and the final table is emitted by a
    # remote task — the driver only holds refs and the scalar n.
    share_ref = _init_share.remote(deg_ref, n)
    ranks_ref = _full_f64.remote(n, 1.0 / n)

    for _ in range(iters):

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

        # no engine groupby: _pr_round scatter-adds every block's
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
        ranks_ref, share_ref = _pr_round.remote(
            nodes_ref, deg_ref, damping, *partial_blocks
        )

    return ray.data.from_arrow_refs(
        [_emit_f64_table.remote(nodes_ref, ranks_ref, "doc_id", "rank")]
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


# ---------------------------------------------------------------------------
# Minimum spanning forest (Boruvka) — iterative primitive #4
# ---------------------------------------------------------------------------

def _min_edge_per_comp(
    comp: np.ndarray, w: np.ndarray, u: np.ndarray, v: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """First edge per component under the TOTAL order (w, u, v) — the
    deterministic tie-break every Boruvka step uses, so the chosen
    forest is independent of block layout and partial-merge order."""
    order = np.lexsort((v, u, w, comp))
    c, ws, us, vs = comp[order], w[order], u[order], v[order]
    first = np.concatenate(([True], c[1:] != c[:-1]))
    return c[first], ws[first], us[first], vs[first]


def _contract(
    comps: np.ndarray, cu: np.ndarray, cv: np.ndarray, labels: np.ndarray
) -> np.ndarray:
    """Star-contraction hooking: comps[i] hooks toward the component at
    the OTHER end of its chosen edge; 2-cycles (mutual choices) break to
    the smaller id; pointer-jumping collapses chains.  Fully vectorized;
    returns the new per-node label array."""
    # parent over component VALUES -> dense index space first
    univ = np.unique(np.concatenate((comps, cu, cv)))
    parent = univ.copy()
    ci = np.searchsorted(univ, comps)
    # other endpoint's component for each chooser
    other = np.where(cu == comps, cv, cu)
    parent[ci] = other
    # break 2-cycles: p[p[c]] == c keeps the smaller value as root
    pi = np.searchsorted(univ, parent)
    two = (parent[pi] == univ) & (univ < parent)
    parent[two] = univ[two]
    # pointer jump to fixpoint (<= log rounds, each vectorized)
    while True:
        nxt = parent[np.searchsorted(univ, parent)]
        if (nxt == parent).all():
            break
        parent = nxt
    # labels whose component had no live edge this round are NOT in univ
    # (isolated components) — they keep their label unchanged
    li = np.clip(np.searchsorted(univ, labels), 0, univ.shape[0] - 1)
    hit = univ[li] == labels
    out = labels.copy()
    out[hit] = parent[li[hit]]
    return out


def _boruvka_rounds(
    node: np.ndarray, u: np.ndarray, v: np.ndarray, w: np.ndarray,
    max_rounds: int,
) -> pa.Table:
    """In-memory vectorized Boruvka over index-compressed edges —
    shared by the local hybrid path and validated round-for-round by the
    distributed plan's gather (same kernels)."""
    labels = node.copy()
    keep_u: list[np.ndarray] = []
    keep_v: list[np.ndarray] = []
    keep_w: list[np.ndarray] = []
    ui = np.searchsorted(node, u)
    vi = np.searchsorted(node, v)
    for _ in range(max_rounds):
        lu, lv = labels[ui], labels[vi]
        live = lu != lv
        if not live.any():
            break
        el_u, el_v, el_w = u[live], v[live], w[live]
        llu, llv = lu[live], lv[live]
        comp = np.concatenate((llu, llv))
        ww = np.concatenate((el_w, el_w))
        uu = np.concatenate((el_u, el_u))
        vv = np.concatenate((el_v, el_v))
        comps, mw, mu, mv = _min_edge_per_comp(comp, ww, uu, vv)
        # dedup mutually chosen edges before recording (composite key is
        # safe: ids <= max node id, and (max+1)^2 must fit int64 — loud)
        if node[-1] > 3_000_000_000:
            raise ValueError("boruvka_mst: node ids too large for composite key")
        _, idx = np.unique(mu * (node[-1] + 1) + mv, return_index=True)
        keep_u.append(mu[idx])
        keep_v.append(mv[idx])
        keep_w.append(mw[idx])
        # component of each chosen edge's endpoints (for hooking)
        cu = labels[np.searchsorted(node, mu)]
        cv = labels[np.searchsorted(node, mv)]
        labels = _contract(comps, cu, cv, labels)
    else:
        raise RuntimeError(f"boruvka_mst did not converge in {max_rounds} rounds")
    if keep_u:
        out_u = np.concatenate(keep_u)
        out_v = np.concatenate(keep_v)
        out_w = np.concatenate(keep_w)
        order = np.lexsort((out_v, out_u, out_w))
        out_u, out_v, out_w = out_u[order], out_v[order], out_w[order]
    else:
        out_u = out_v = out_w = np.empty(0, dtype=np.int64)
    return pa.table(
        {
            "u": pa.array(out_u, type=pa.int64()),
            "v": pa.array(out_v, type=pa.int64()),
            "w": pa.array(out_w, type=pa.int64()),
        }
    )


MST_LOCAL_MAX = 4_000_000  # 24 B/edge -> <=~100 MB gathered in one task


def boruvka_mst(
    edges: ray.data.Dataset,
    *,
    max_rounds: int = 64,
    local_max_edges: int = MST_LOCAL_MAX,
) -> ray.data.Dataset:
    """Minimum spanning FOREST (Boruvka) over an undirected weighted
    edge list (u, v, w) int64 — the bulk-synchronous hooking primitive
    behind single-linkage clustering dendrograms (cut the forest at a
    threshold and you have the flagship's CC at that threshold).

    Distributed plan per round (edges never reshuffle):

      * labels (8 B/node) broadcast by ref, same posture as pagerank;
      * edge blocks stream a stateless map: relabel endpoints, drop
        intra-component edges, emit <= 2 x distinct-component skinny
        (comp, w, u, v) per-block MINIMA — the classic Boruvka
        "min outgoing edge per component" as a per-batch combiner;
      * ONE gather task merges partials (same total order (w, u, v)),
        hooks components star-wise, pointer-jumps labels — O(log n)
        rounds total because every live component merges every round.

    Chosen-edge total is <= n-1 across all rounds (24 B/node driver-side
    accumulation — the keep-set budget class).  Deterministic at any
    block layout: per-component minima under a total order are
    associative, and hooking breaks ties to the smaller component id.

    Hybrid crossover (near_dupe/cluster discipline): edge sets under
    ``local_max_edges`` run the identical vectorized rounds in ONE
    remote task.  Outputs are identical either way.
    """
    edges = edges.select_columns(["u", "v", "w"]).materialize()
    edge_refs = edges.to_arrow_refs()
    n_edges = edges.count()
    EMPTY = pa.table(
        {
            "u": pa.nulls(0, pa.int64()),
            "v": pa.nulls(0, pa.int64()),
            "w": pa.nulls(0, pa.int64()),
        }
    )
    if n_edges == 0:
        return ray.data.from_arrow(EMPTY)

    if n_edges <= local_max_edges:

        @ray.remote
        def _local(*blocks: pa.Table) -> pa.Table:
            live = [b for b in blocks if b.num_rows and "u" in b.column_names]
            u = np.concatenate(
                [b["u"].to_numpy(zero_copy_only=False) for b in live]
            ).astype(np.int64)
            v = np.concatenate(
                [b["v"].to_numpy(zero_copy_only=False) for b in live]
            ).astype(np.int64)
            w = np.concatenate(
                [b["w"].to_numpy(zero_copy_only=False) for b in live]
            ).astype(np.int64)
            node = np.unique(np.concatenate((u, v)))
            return _boruvka_rounds(node, u, v, w, max_rounds)

        return ray.data.from_arrow_refs([_local.remote(*edge_refs)])

    # ---- distributed rounds ----

    @ray.remote
    def _uv_nodes(*blocks: pa.Table) -> np.ndarray:
        vals = [
            np.concatenate(
                (
                    b["u"].to_numpy(zero_copy_only=False).astype(np.int64),
                    b["v"].to_numpy(zero_copy_only=False).astype(np.int64),
                )
            )
            for b in blocks
            if b.num_rows and "u" in b.column_names
        ]
        if not vals:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(vals))

    # per-node state (sorted node ids, labels) stays an ObjectRef
    # end-to-end: _merge_and_hook's new-label output IS the next round's
    # broadcast, chosen-edge tables stay refs until the final off-driver
    # concat, and the driver only ray.get()s the per-round scalar
    # chosen-edge count (the convergence signal).
    nodes_ref = _uv_nodes.remote(*edge_refs)
    labels_ref = _copy_arr.remote(nodes_ref)
    chosen_refs: list = []

    @ray.remote(num_returns=3)
    def _merge_and_hook(nd: np.ndarray, labels_in: np.ndarray, *parts: pa.Table):
        live = [p for p in parts if p.num_rows and "comp" in p.column_names]
        if not live:
            return None, labels_in, 0
        comp = np.concatenate(
            [p["comp"].to_numpy(zero_copy_only=False) for p in live]
        )
        w = np.concatenate([p["w"].to_numpy(zero_copy_only=False) for p in live])
        u = np.concatenate([p["u"].to_numpy(zero_copy_only=False) for p in live])
        v = np.concatenate([p["v"].to_numpy(zero_copy_only=False) for p in live])
        comps, mw, mu, mv = _min_edge_per_comp(comp, w, u, v)
        if nd[-1] > 3_000_000_000:
            raise ValueError("boruvka_mst: node ids too large for composite key")
        _, idx = np.unique(mu * (nd[-1] + 1) + mv, return_index=True)
        tbl = pa.table(
            {
                "u": pa.array(mu[idx], type=pa.int64()),
                "v": pa.array(mv[idx], type=pa.int64()),
                "w": pa.array(mw[idx], type=pa.int64()),
            }
        )
        cu = labels_in[np.searchsorted(nd, mu)]
        cv = labels_in[np.searchsorted(nd, mv)]
        new_labels = _contract(comps, cu, cv, labels_in)
        return tbl, new_labels, int(tbl.num_rows)

    converged = False
    # max_rounds + 1: the final iteration may be a pure zero-progress
    # probe observing that the previous round finished the forest
    for _ in range(max_rounds + 1):

        def partial_min(batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "comp": pa.nulls(0, pa.int64()),
                    "w": pa.nulls(0, pa.int64()),
                    "u": pa.nulls(0, pa.int64()),
                    "v": pa.nulls(0, pa.int64()),
                }
            )
            if batch.num_rows == 0 or "u" not in batch.column_names:
                return empty
            nd = ray.get(nodes_ref)
            lb = ray.get(labels_ref)
            bu = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            bv = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            bw = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
            lu = lb[np.searchsorted(nd, bu)]
            lv = lb[np.searchsorted(nd, bv)]
            m = lu != lv
            if not m.any():
                return empty
            comp = np.concatenate((lu[m], lv[m]))
            ww = np.concatenate((bw[m], bw[m]))
            uu = np.concatenate((bu[m], bu[m]))
            vv = np.concatenate((bv[m], bv[m]))
            c, w_, u_, v_ = _min_edge_per_comp(comp, ww, uu, vv)
            return pa.table(
                {
                    "comp": pa.array(c),
                    "w": pa.array(w_),
                    "u": pa.array(u_),
                    "v": pa.array(v_),
                }
            )

        part_refs = (
            edges.map_batches(partial_min, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        tbl_ref, labels_ref, n_new_ref = _merge_and_hook.remote(
            nodes_ref, labels_ref, *part_refs
        )
        if ray.get(n_new_ref) == 0:  # scalar signal only
            converged = True
            break
        chosen_refs.append(tbl_ref)
    if not converged:
        raise RuntimeError(f"boruvka_mst did not converge in {max_rounds} rounds")

    if not chosen_refs:
        return ray.data.from_arrow(EMPTY)
    return ray.data.from_arrow_refs(
        [_concat_sort_uvw.remote(*chosen_refs)]
    )


# ---------------------------------------------------------------------------
# k-core decomposition (coreness peeling) — iterative primitive #5
# ---------------------------------------------------------------------------

def _csr(node: np.ndarray, u: np.ndarray, v: np.ndarray):
    """Symmetrized CSR incidence over index-compressed edges."""
    n = node.shape[0]
    ui = np.searchsorted(node, u)
    vi = np.searchsorted(node, v)
    ends = np.concatenate((ui, vi))
    nbrs = np.concatenate((vi, ui))
    order = np.argsort(ends, kind="stable")
    ends_s, nbrs_s = ends[order], nbrs[order]
    starts = np.searchsorted(ends_s, np.arange(n))
    stops = np.searchsorted(ends_s, np.arange(n) + 1)
    return nbrs_s, starts, stops


def _gather_slices(
    nbrs_s: np.ndarray, starts: np.ndarray, stops: np.ndarray,
    widx: np.ndarray,
) -> np.ndarray:
    """Concatenate CSR ranges of the given nodes, vectorized."""
    lens = stops[widx] - starts[widx]
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=nbrs_s.dtype)
    pos = np.repeat(starts[widx], lens) + (
        np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
    )
    return nbrs_s[pos]


def _peel_coreness(
    node: np.ndarray, u: np.ndarray, v: np.ndarray, max_rounds: int
) -> np.ndarray:
    """FRONTIER-based peeling over index-compressed edges: remove every
    alive node whose residual degree <= k (assigning coreness k); the
    next wave's candidates are exactly the neighbors whose degree just
    dropped — per-wave cost is O(wave + incident edges), NOT O(n), so
    chain cascades (one node exposed per wave) stay linear overall.
    When the cascade dries up, k advances to the minimum alive degree
    (<= degeneracy such scans, each O(n))."""
    n = node.shape[0]
    nbrs_s, starts, stops = _csr(node, u, v)
    core = np.zeros(n, dtype=np.int64)
    alive = np.ones(n, dtype=bool)
    rdeg = (stops - starts).astype(np.int64)
    n_alive = n
    k = 0
    waves = 0
    # every wave removes >= 1 node, so total waves <= n structurally; the
    # cap scales with node count rather than charging chain cascades
    # (~n/2 waves of linear total work) against a fixed round budget
    wave_cap = max(max_rounds, n + 1)
    while n_alive > 0:
        amin = int(rdeg[alive].min())
        if amin > k:
            k = amin
        # seed frontier: O(n) scan, once per k-level advance
        frontier = np.flatnonzero(alive & (rdeg <= k))
        while frontier.size:
            waves += 1
            if waves > wave_cap:
                raise RuntimeError(
                    f"coreness did not converge in {wave_cap} waves"
                )
            core[frontier] = k
            alive[frontier] = False
            n_alive -= frontier.size
            touched = _gather_slices(nbrs_s, starts, stops, frontier)
            touched = touched[alive[touched]]
            if touched.size == 0:
                frontier = np.empty(0, dtype=np.int64)
                continue
            np.subtract.at(rdeg, touched, 1)
            cand = np.unique(touched)
            frontier = cand[alive[cand] & (rdeg[cand] <= k)]
    return core


def _bc_peel(
    n_int: int,
    iu: np.ndarray,
    iv: np.ndarray,
    ext_at: np.ndarray,
    ext_val: np.ndarray,
    max_waves: int,
) -> np.ndarray:
    """BOUNDARY-CONDITIONED frontier peel: coreness of the internal
    nodes 0..n_int-1 of a subgraph whose edges are (iu, iv) internal
    index pairs, where additionally internal node ext_at[j] has an
    EXTERNAL neighbor pinned to peel exactly at level ext_val[j]
    (its current coreness estimate).  This is one block-Jacobi update
    of the core decomposition (Montresor/De Pellegrini/Miorandi 2011,
    "Distributed k-core decomposition": local recomputation from
    neighbor estimates, monotone from any upper bound): externals with
    value <= k are subtracted when the level reaches k, internal
    cascades run frontier-wise, removal level = new estimate."""
    nbrs_s, starts, stops = _csr(
        np.arange(n_int, dtype=np.int64), iu, iv
    ) if iu.size else (
        np.empty(0, dtype=np.int64),
        np.zeros(n_int, dtype=np.int64),
        np.zeros(n_int, dtype=np.int64),
    )
    rdeg = (stops - starts).astype(np.int64)
    if ext_at.size:
        np.add.at(rdeg, ext_at, 1)
        o = np.argsort(ext_val, kind="stable")
        ext_at, ext_val = ext_at[o], ext_val[o]
    core = np.zeros(n_int, dtype=np.int64)
    alive = np.ones(n_int, dtype=bool)
    n_alive = n_int
    p = 0  # pointer into value-sorted ext pairs (all <= k consumed)
    k = 0
    waves = 0
    while n_alive > 0:
        amin = int(rdeg[alive].min())
        nxt = int(ext_val[p]) if p < ext_val.shape[0] else amin
        k = max(k, min(amin, nxt))
        # externals pinned at or below the new level leave now
        while p < ext_val.shape[0] and ext_val[p] <= k:
            if alive[ext_at[p]]:
                rdeg[ext_at[p]] -= 1
            p += 1
        frontier = np.flatnonzero(alive & (rdeg <= k))
        while frontier.size:
            waves += 1
            if waves > max_waves:
                raise RuntimeError(
                    f"_bc_peel did not converge in {max_waves} waves"
                )
            core[frontier] = k
            alive[frontier] = False
            n_alive -= frontier.size
            touched = _gather_slices(nbrs_s, starts, stops, frontier)
            touched = touched[alive[touched]]
            if touched.size == 0:
                break
            np.subtract.at(rdeg, touched, 1)
            cand = np.unique(touched)
            frontier = cand[alive[cand] & (rdeg[cand] <= k)]
    return core


CORE_LOCAL_MAX = 4_000_000  # 16 B/edge -> <=~64 MB gathered in one task


def coreness(
    edges: ray.data.Dataset,
    *,
    max_rounds: int = 100_000,
    local_max_edges: int = CORE_LOCAL_MAX,
) -> ray.data.Dataset:
    """k-core DECOMPOSITION over an undirected edge list (u, v) int64:
    each node's coreness = the largest k such that it survives in the
    k-core (every member has >= k neighbors inside the core) — the
    density ladder behind spam-farm / boilerplate-hub detection on the
    near-dup graph (high-coreness docs sit in densely mutually-similar
    families; bridges and chains peel early).

    Distributed plan — the H-INDEX FIXPOINT (Lu et al. 2016: c <- deg,
    then c_v <- H({c_n : n in N(v)}) until no change converges to
    coreness), NOT distributed peeling: peel waves can cascade one node
    at a time along chains (O(n) full edge passes — the failure mode
    the first cut of this operator hit at 1M nodes), while the h-index
    recurrence converges in rounds bounded by the graph's peel DEPTH
    and updates every node per round.  Each round broadcasts the c
    vector (8 B/node) and runs ONE node%P-co-partitioned exchange of
    (node, neighbor_c) pairs whose kernel computes per-node h-indexes
    vectorized; a gather task rebuilds c and tests the fixpoint.

    Hybrid crossover: edge sets under ``local_max_edges`` peel in ONE
    remote task with FRONTIER waves over CSR (per-wave cost is
    O(wave + incident edges), chain-cascade safe).  Both paths are
    exact coreness.  Returns (doc_id, coreness); isolated ids never
    appear (no edges)."""
    edges = edges.select_columns(["u", "v"]).materialize()
    edge_refs = edges.to_arrow_refs()
    n_edges = edges.count()
    EMPTY = pa.table(
        {
            "doc_id": pa.nulls(0, pa.int64()),
            "coreness": pa.nulls(0, pa.int64()),
        }
    )
    if n_edges == 0:
        return ray.data.from_arrow(EMPTY)

    @ray.remote
    def _uv_nodes_deg(*blocks: pa.Table):
        us, vs = [], []
        for b in blocks:
            if b.num_rows and "u" in b.column_names:
                us.append(b["u"].to_numpy(zero_copy_only=False).astype(np.int64))
                vs.append(b["v"].to_numpy(zero_copy_only=False).astype(np.int64))
        allv = np.concatenate(us + vs)
        nodes, counts = np.unique(allv, return_counts=True)
        return nodes, counts.astype(np.int64)

    if n_edges <= local_max_edges:

        @ray.remote
        def _local(*blocks: pa.Table) -> pa.Table:
            live = [b for b in blocks if b.num_rows and "u" in b.column_names]
            u = np.concatenate(
                [b["u"].to_numpy(zero_copy_only=False) for b in live]
            ).astype(np.int64)
            v = np.concatenate(
                [b["v"].to_numpy(zero_copy_only=False) for b in live]
            ).astype(np.int64)
            node = np.unique(np.concatenate((u, v)))
            core = _peel_coreness(node, u, v, max_rounds)
            return pa.table(
                {
                    "doc_id": pa.array(node, type=pa.int64()),
                    "coreness": pa.array(core, type=pa.int64()),
                }
            )

        return ray.data.from_arrow_refs([_local.remote(*edge_refs)])

    # ---- distributed block-Jacobi rounds (range-partitioned) ----
    # Each round, every partition re-peels its contiguous node RANGE
    # with external neighbors pinned at their current estimates
    # (_bc_peel) — one block-Jacobi update of the core decomposition
    # (Montresor et al. 2011).  Starting from c = degree (an upper
    # bound), estimates decrease monotonically to exact coreness; a
    # cascade that crosses partition boundaries b times needs ~b rounds
    # (NOT chain-length rounds — the failure mode of both naive
    # distributed peeling and the plain h-index fixpoint on chain-heavy
    # graphs).  Range partitioning keeps id-local chains internal.
    P = 32
    # per-node state (ids, splits, estimates) stays an ObjectRef
    # end-to-end — the driver holds refs plus the scalar n and the
    # per-round changed count (the convergence signal)
    nodes_ref, deg_ref = _uv_nodes_deg.options(num_returns=2).remote(*edge_refs)
    n = ray.get(_arr_len.remote(nodes_ref))

    @ray.remote
    def _mk_splits(nd: np.ndarray) -> np.ndarray:
        # balanced contiguous ranges over the observed node ids
        split_idx = (np.arange(1, P) * nd.shape[0]) // P
        return nd[split_idx]  # part = searchsorted(splits, id, 'right')

    splits_ref = _mk_splits.remote(nodes_ref)
    c_ref = _copy_arr.remote(deg_ref)

    def tag_edges(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "u": pa.nulls(0, pa.int64()),
                "v": pa.nulls(0, pa.int64()),
                "part": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "u" not in batch.column_names:
            return empty
        sp = ray.get(splits_ref)
        bu = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        bv = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        pu = np.searchsorted(sp, bu, side="right")
        pv = np.searchsorted(sp, bv, side="right")
        # boundary edges ship to BOTH endpoint partitions
        cross = pu != pv
        return pa.table(
            {
                "u": pa.array(np.concatenate((bu, bu[cross]))),
                "v": pa.array(np.concatenate((bv, bv[cross]))),
                "part": pa.array(np.concatenate((pu, pv[cross]))),
            }
        )

    tagged = edges.map_batches(tag_edges, batch_format="pyarrow").materialize()

    @ray.remote(num_returns=2)
    def _gather_c(n_: int, c_prev: np.ndarray, *parts: pa.Table):
        out = np.zeros(n_, dtype=np.int64)
        for p in parts:
            if p.num_rows == 0 or "node" not in p.column_names:
                continue
            ni = p["node"].to_numpy(zero_copy_only=False)
            hv = p["c"].to_numpy(zero_copy_only=False)
            out[ni] = hv
        return out, int((out != c_prev).sum())

    rounds = min(max_rounds, 10_000)
    converged = False
    for _ in range(rounds):

        def block_update(group: pa.Table) -> pa.Table:
            empty = pa.table(
                {"node": pa.nulls(0, pa.int64()), "c": pa.nulls(0, pa.int64())}
            )
            if group.num_rows == 0 or "u" not in group.column_names:
                return empty
            nd = ray.get(nodes_ref)
            sp = ray.get(splits_ref)
            cc = ray.get(c_ref)
            my_part = int(group["part"][0].as_py())
            bu = group["u"].to_numpy(zero_copy_only=False)
            bv = group["v"].to_numpy(zero_copy_only=False)
            pu = np.searchsorted(sp, bu, side="right")
            pv = np.searchsorted(sp, bv, side="right")
            u_in = pu == my_part
            v_in = pv == my_part
            # internal node universe: endpoints of my edges in my range
            int_ids = np.unique(np.concatenate((bu[u_in], bv[v_in])))
            n_int = int_ids.shape[0]
            both = u_in & v_in
            iu = np.searchsorted(int_ids, bu[both])
            iv = np.searchsorted(int_ids, bv[both])
            # boundary edges: internal endpoint + external pinned value
            bo_u = u_in & ~v_in  # u internal, v external
            bo_v = v_in & ~u_in
            ext_at = np.concatenate(
                (
                    np.searchsorted(int_ids, bu[bo_u]),
                    np.searchsorted(int_ids, bv[bo_v]),
                )
            )
            ext_val = np.concatenate(
                (
                    cc[np.searchsorted(nd, bv[bo_u])],
                    cc[np.searchsorted(nd, bu[bo_v])],
                )
            )
            core = _bc_peel(n_int, iu, iv, ext_at, ext_val, 10 * n_int + 100)
            return pa.table(
                {
                    "node": pa.array(np.searchsorted(nd, int_ids)),
                    "c": pa.array(core),
                }
            )

        part_refs = (
            tagged.groupby("part")
            .map_groups(block_update, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        new_c_ref, changed_ref = _gather_c.remote(n, c_ref, *part_refs)
        changed = ray.get(changed_ref)  # scalar signal only
        if changed == 0:
            converged = True
            break
        c_ref = new_c_ref
    if not converged:
        raise RuntimeError(f"coreness did not converge in {rounds} rounds")

    return ray.data.from_arrow_refs(
        [_emit_i64_table.remote(nodes_ref, c_ref, "doc_id", "coreness")]
    )


# ---------------------------------------------------------------------------
# maximal matching (locally-dominant edges) — iterative primitive #6
# ---------------------------------------------------------------------------

def _dominant_edges(
    mw: np.ndarray, mu: np.ndarray, mv: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Given each node's MIN incident edge under the (w, u, v) total
    order, the locally-dominant edges are exactly those chosen by BOTH
    endpoints — they appear twice in the per-node minima.  Detected by
    adjacent duplicates after a (w, u, v) lexsort (no composite-key
    overflow risk)."""
    order = np.lexsort((mv, mu, mw))
    sw, su, sv = mw[order], mu[order], mv[order]
    dup = (
        (sw[1:] == sw[:-1]) & (su[1:] == su[:-1]) & (sv[1:] == sv[:-1])
    )
    i = np.flatnonzero(dup)
    return sw[i], su[i], sv[i]


def _match_rounds(
    u: np.ndarray, v: np.ndarray, w: np.ndarray, max_rounds: int
) -> pa.Table:
    """In-memory vectorized locally-dominant matching — equals the
    SEQUENTIAL greedy matching under the strict total order (w, u, v)
    (Preis-style local-max: an edge minimal at both endpoints is always
    greedy-chosen, and removing all such edges plus their neighbors
    preserves the invariant).  Guaranteed progress every round (the
    globally minimal live edge is always dominant), so rounds <=
    matching size; pseudo-random weights finish in O(log m) rounds —
    an adversarial sorted chain degrades to one match per round, same
    caveat class as the coreness cascade."""
    out_u: list[np.ndarray] = []
    out_v: list[np.ndarray] = []
    out_w: list[np.ndarray] = []
    rounds = 0
    # while-with-counter (not for/else): an edge set emptied exactly on
    # the final permitted round IS convergence — only live edges left
    # after the budget are a failure
    while u.size:
        if rounds >= max_rounds:
            raise RuntimeError(
                f"maximal_matching did not converge in {max_rounds} rounds"
            )
        rounds += 1
        comp = np.concatenate((u, v))
        ww = np.concatenate((w, w))
        uu = np.concatenate((u, u))
        vv = np.concatenate((v, v))
        _, mw, mu, mv = _min_edge_per_comp(comp, ww, uu, vv)
        dw, du, dv = _dominant_edges(mw, mu, mv)
        out_u.append(du)
        out_v.append(dv)
        out_w.append(dw)
        dead = np.unique(np.concatenate((du, dv)))
        alive = ~(
            np.isin(u, dead, assume_unique=False)
            | np.isin(v, dead, assume_unique=False)
        )
        u, v, w = u[alive], v[alive], w[alive]
    if out_u:
        au = np.concatenate(out_u)
        av = np.concatenate(out_v)
        aw = np.concatenate(out_w)
        order = np.lexsort((av, au, aw))
        au, av, aw = au[order], av[order], aw[order]
    else:
        au = av = aw = np.empty(0, dtype=np.int64)
    return pa.table(
        {
            "u": pa.array(au, type=pa.int64()),
            "v": pa.array(av, type=pa.int64()),
            "w": pa.array(aw, type=pa.int64()),
        }
    )


def maximal_matching(
    edges: ray.data.Dataset,
    *,
    max_rounds: int = 4096,
    local_max_edges: int = MST_LOCAL_MAX,
) -> ray.data.Dataset:
    """GREEDY MAXIMAL MATCHING over an undirected weighted edge list
    (u, v, w) int64 — the "pair every near-dup doc with its single best
    partner" primitive (dedup keep/drop arbitration, one-to-one record
    linkage assignment).  Output = the matching the SEQUENTIAL greedy
    algorithm produces under the strict total order (w, u, v), computed
    in parallel rounds of locally-dominant edges (an edge minimal at
    BOTH endpoints is greedy-safe; all such edges are independent).

    Distributed plan per round (edges never reshuffle — same posture as
    boruvka_mst):

      * matched-vertex set broadcast by ref (8 B/matched node, <= n
        total across all rounds);
      * edge blocks stream a stateless map: drop edges touching matched
        vertices, emit per-NODE (node, w, u, v) block minima — the
        associative per-batch combiner (node plays boruvka's comp);
      * ONE gather merges partials to final per-node minima; edges
        appearing twice (chosen by both endpoints) are this round's
        matches.

    Hybrid crossover: edge sets under ``local_max_edges`` run the
    identical vectorized rounds in one remote task; outputs identical.
    """
    edges = edges.select_columns(["u", "v", "w"]).materialize()
    edge_refs = edges.to_arrow_refs()
    n_edges = edges.count()
    EMPTY = pa.table(
        {
            "u": pa.nulls(0, pa.int64()),
            "v": pa.nulls(0, pa.int64()),
            "w": pa.nulls(0, pa.int64()),
        }
    )
    if n_edges == 0:
        return ray.data.from_arrow(EMPTY)

    if n_edges <= local_max_edges:

        @ray.remote
        def _local(*blocks: pa.Table) -> pa.Table:
            live = [b for b in blocks if b.num_rows and "u" in b.column_names]
            u = np.concatenate(
                [b["u"].to_numpy(zero_copy_only=False) for b in live]
            ).astype(np.int64)
            v = np.concatenate(
                [b["v"].to_numpy(zero_copy_only=False) for b in live]
            ).astype(np.int64)
            w = np.concatenate(
                [b["w"].to_numpy(zero_copy_only=False) for b in live]
            ).astype(np.int64)
            return _match_rounds(u, v, w, max_rounds)

        return ray.data.from_arrow_refs([_local.remote(*edge_refs)])

    # ---- distributed rounds ----
    # matched-vertex state stays an ObjectRef end-to-end (the gather
    # task folds this round's matches into the sorted dead set and that
    # output is the next round's broadcast); the driver only ray.get()s
    # the scalar per-round match count.
    matched_ref = ray.put(np.empty(0, dtype=np.int64))
    chosen_refs: list = []

    @ray.remote(num_returns=3)
    def _gather_round(matched_in: np.ndarray, *parts: pa.Table):
        live = [p for p in parts if p.num_rows and "node" in p.column_names]
        if not live:
            return None, matched_in, 0
        nodev = np.concatenate(
            [p["node"].to_numpy(zero_copy_only=False) for p in live]
        )
        w = np.concatenate([p["w"].to_numpy(zero_copy_only=False) for p in live])
        u = np.concatenate([p["u"].to_numpy(zero_copy_only=False) for p in live])
        v = np.concatenate([p["v"].to_numpy(zero_copy_only=False) for p in live])
        _, mw, mu, mv = _min_edge_per_comp(nodev, w, u, v)
        dw, du, dv = _dominant_edges(mw, mu, mv)
        if du.size == 0:
            return None, matched_in, 0
        tbl = pa.table(
            {
                "u": pa.array(du, type=pa.int64()),
                "v": pa.array(dv, type=pa.int64()),
                "w": pa.array(dw, type=pa.int64()),
            }
        )
        newly = np.concatenate((du, dv))
        new_matched = np.unique(np.concatenate((matched_in, newly)))
        return tbl, new_matched, int(du.size)

    converged = False
    # max_rounds + 1: the final iteration may be a pure zero-progress
    # probe observing that the previous round emptied the edge set
    for _ in range(max_rounds + 1):

        def partial_min(batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "node": pa.nulls(0, pa.int64()),
                    "w": pa.nulls(0, pa.int64()),
                    "u": pa.nulls(0, pa.int64()),
                    "v": pa.nulls(0, pa.int64()),
                }
            )
            if batch.num_rows == 0 or "u" not in batch.column_names:
                return empty
            dead = ray.get(matched_ref)
            bu = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            bv = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            bw = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
            if dead.size:
                iu = np.searchsorted(dead, bu)
                iv = np.searchsorted(dead, bv)
                du = (iu < dead.size) & (dead[np.minimum(iu, dead.size - 1)] == bu)
                dv = (iv < dead.size) & (dead[np.minimum(iv, dead.size - 1)] == bv)
                m = ~(du | dv)
                bu, bv, bw = bu[m], bv[m], bw[m]
            if bu.size == 0:
                return empty
            comp = np.concatenate((bu, bv))
            ww = np.concatenate((bw, bw))
            uu = np.concatenate((bu, bu))
            vv = np.concatenate((bv, bv))
            c, w_, u_, v_ = _min_edge_per_comp(comp, ww, uu, vv)
            return pa.table(
                {
                    "node": pa.array(c),
                    "w": pa.array(w_),
                    "u": pa.array(u_),
                    "v": pa.array(v_),
                }
            )

        part_refs = (
            edges.map_batches(partial_min, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        tbl_ref, matched_ref, n_new_ref = _gather_round.remote(
            matched_ref, *part_refs
        )
        if ray.get(n_new_ref) == 0:  # scalar signal only
            converged = True
            break
        chosen_refs.append(tbl_ref)
    if not converged:
        raise RuntimeError(
            f"maximal_matching did not converge in {max_rounds} rounds"
        )

    if not chosen_refs:
        return ray.data.from_arrow(EMPTY)
    return ray.data.from_arrow_refs(
        [_concat_sort_uvw.remote(*chosen_refs)]
    )


def label_propagation(
    edges: ray.data.Dataset, *, rounds: int = 8
) -> ray.data.Dataset:
    """Synchronous label-propagation communities over an UNDIRECTED edge
    list (u, v) — iterative graph primitive #8.  Deterministic spec
    (every engine computing it gets the identical result): labels start
    as node ids; each round, EVERY node simultaneously adopts the
    smallest among the most frequent labels over its neighbors plus ONE
    self-vote for its current label; fixed round count (convergence is
    not required — the spec is the round count).  Unlike the min-label
    propagation of connected components, the MODE update respects local
    density, so bridges between dense regions do not instantly merge
    communities.

    Scale posture: edges materialize once and stream per round; labels
    broadcast 8 B/node; each round is ONE node%P exchange of per-batch
    (node, nbr_label, cnt) combiners (<= 2 rows per edge before in-batch
    combining), and the kernel's mode/tie-break is a vectorized lexsort
    — no per-node Python.  Returns (doc_id, community)."""
    P = 32
    edges = edges.select_columns(["u", "v"]).materialize()

    @ray.remote
    def _nodes(*blocks: pa.Table) -> np.ndarray:
        parts = [
            np.concatenate(
                (
                    b["u"].to_numpy(zero_copy_only=False),
                    b["v"].to_numpy(zero_copy_only=False),
                )
            )
            for b in blocks
            if b.num_rows and "u" in b.column_names
        ]
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(parts)).astype(np.int64)

    # per-node state stays an ObjectRef end-to-end; the driver holds
    # refs plus three scalars (count / min / max for the id-range guard)
    nodes_ref = _nodes.remote(*edges.to_arrow_refs())
    n, nmin, nmax = ray.get(_arr_stats.remote(nodes_ref))
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.nulls(0, pa.int64()),
                    "community": pa.nulls(0, pa.int64()),
                }
            )
        )
    if nmin < 0 or nmax >= 2**31:
        # (node, label) pairs pack into one int64 key; labels are node
        # ids, so both must sit in [0, 2^31) — loud, not silent
        raise ValueError("label_propagation: node ids must be in [0, 2^31)")
    lab_ref = _copy_arr.remote(nodes_ref)  # label init = node id

    EMPTY = pa.table(
        {
            "node": pa.nulls(0, pa.int64()),
            "lab": pa.nulls(0, pa.int64()),
            "cnt": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    for _ in range(rounds):

        def emit(batch: pa.Table, _l=lab_ref) -> pa.Table:
            if batch.num_rows == 0 or "u" not in batch.column_names:
                return EMPTY
            nd = ray.get(nodes_ref)
            lb = ray.get(_l)
            u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            ui = np.searchsorted(nd, u)
            vi = np.searchsorted(nd, v)
            node = np.concatenate((u, v))
            lab = np.concatenate((lb[vi], lb[ui]))
            # in-batch combine: (node, lab) -> count
            key = node * np.int64(2**31) + lab  # labels are node ids < 2^31
            uk, inv = np.unique(key, return_inverse=True)
            cnt = np.bincount(inv).astype(np.int64)
            kn = (uk // np.int64(2**31)).astype(np.int64)
            return pa.table(
                {
                    "node": pa.array(kn),
                    "lab": pa.array(uk % np.int64(2**31)),
                    "cnt": pa.array(cnt),
                    "part": pa.array(kn % P),
                }
            )

        def modek(group: pa.Table, _l=lab_ref) -> pa.Table:
            empty = pa.table(
                {
                    "node": pa.nulls(0, pa.int64()),
                    "new_lab": pa.nulls(0, pa.int64()),
                }
            )
            if group.num_rows == 0 or "node" not in group.column_names:
                return empty
            nd = ray.get(nodes_ref)
            lb = ray.get(_l)
            node = group["node"].to_numpy(zero_copy_only=False)
            lab = group["lab"].to_numpy(zero_copy_only=False)
            cnt = group["cnt"].to_numpy(zero_copy_only=False)
            # fold cross-batch partials + ONE self-vote per node
            un = np.unique(node)
            node = np.concatenate((node, un))
            lab = np.concatenate((lab, lb[np.searchsorted(nd, un)]))
            cnt = np.concatenate((cnt, np.ones(un.shape[0], np.int64)))
            key = node * np.int64(2**31) + lab
            uk, inv = np.unique(key, return_inverse=True)
            tot = np.zeros(uk.shape[0], dtype=np.int64)
            np.add.at(tot, inv, cnt)
            kn = uk // np.int64(2**31)
            kl = uk % np.int64(2**31)
            # per node: max count, tie -> smallest label (lexsort asc by
            # (node, -cnt, lab) then first row per node)
            o = np.lexsort((kl, -tot, kn))
            kn, kl = kn[o], kl[o]
            first = np.ones(kn.shape[0], dtype=bool)
            first[1:] = kn[1:] != kn[:-1]
            return pa.table(
                {"node": pa.array(kn[first]), "new_lab": pa.array(kl[first])}
            )

        new_refs = (
            edges.map_batches(emit, batch_format="pyarrow")
            .groupby("part")
            .map_groups(modek, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        # scatter the per-part updates into the label vector OFF-DRIVER;
        # parts are node-disjoint so application order is irrelevant
        lab_ref = _scatter_i64.remote(nodes_ref, lab_ref, "new_lab", *new_refs)

    return ray.data.from_arrow_refs(
        [_emit_i64_table.remote(nodes_ref, lab_ref, "doc_id", "community")]
    )


def wl_refinement(
    edges: ray.data.Dataset, *, rounds: int = 3
) -> ray.data.Dataset:
    """Weisfeiler-Lehman color refinement over an UNDIRECTED edge list
    (u, v) — iterative graph primitive #9, the structural fingerprint
    behind graph-isomorphism screening and WL graph kernels.  Round 0
    colors every node by its degree; round r+1 hashes (own color,
    sorted multiset of neighbor colors) with splitmix64 chaining.
    Deterministic by construction: the multiset is folded in sorted
    order, so any partitioning computes the identical 63-bit color.

    Scale posture: identical to label_propagation — edges materialize
    once and stream per round, colors broadcast 8 B/node, each round is
    ONE node%P exchange of (node, nbr_color) pairs whose kernel sorts
    each node's segment and chains the hash vectorized (np.lexsort +
    reduce by segment, no per-node Python).  Returns (doc_id, wl_color)
    with colors in [0, 2^63)."""
    P = 32
    edges = edges.select_columns(["u", "v"]).materialize()

    @ray.remote
    def _nodes_deg(*blocks: pa.Table):
        us, vs = [], []
        for b in blocks:
            if b.num_rows and "u" in b.column_names:
                us.append(b["u"].to_numpy(zero_copy_only=False))
                vs.append(b["v"].to_numpy(zero_copy_only=False))
        if not us:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        ends = np.concatenate(us + vs)
        nodes, deg = np.unique(ends, return_counts=True)
        return nodes.astype(np.int64), deg.astype(np.int64)

    # per-node state stays an ObjectRef end-to-end (round-5 discipline)
    nodes_ref, deg_ref = _nodes_deg.options(num_returns=2).remote(
        *edges.to_arrow_refs()
    )
    n = ray.get(_arr_len.remote(nodes_ref))
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.nulls(0, pa.int64()),
                    "wl_color": pa.nulls(0, pa.int64()),
                }
            )
        )

    MASK63 = np.uint64((1 << 63) - 1)

    def _mix(z: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            z = z + np.uint64(0x9E3779B97F4A7C15)
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            return z ^ (z >> np.uint64(31))

    @ray.remote
    def _wl_init(deg: np.ndarray) -> np.ndarray:
        return (_mix(deg.astype(np.uint64)) & MASK63).astype(np.int64)

    col_ref = _wl_init.remote(deg_ref)

    EMPTY = pa.table(
        {
            "node": pa.nulls(0, pa.int64()),
            "c": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    for _ in range(rounds):

        def emit(batch: pa.Table, _c=col_ref) -> pa.Table:
            if batch.num_rows == 0 or "u" not in batch.column_names:
                return EMPTY
            nd = ray.get(nodes_ref)
            cl = ray.get(_c)
            u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            ui = np.searchsorted(nd, u)
            vi = np.searchsorted(nd, v)
            node = np.concatenate((u, v))
            c = np.concatenate((cl[vi], cl[ui]))
            return pa.table(
                {
                    "node": pa.array(node),
                    "c": pa.array(c),
                    "part": pa.array(node % P),
                }
            )

        def refine(group: pa.Table, _c=col_ref) -> pa.Table:
            empty = pa.table(
                {
                    "node": pa.nulls(0, pa.int64()),
                    "new_c": pa.nulls(0, pa.int64()),
                }
            )
            if group.num_rows == 0 or "node" not in group.column_names:
                return empty
            nd = ray.get(nodes_ref)
            cl = ray.get(_c)
            node = group["node"].to_numpy(zero_copy_only=False)
            c = group["c"].to_numpy(zero_copy_only=False)
            # sorted multiset fold per node: order by (node, color) then
            # chain acc = mix(acc ^ mix(color)) left-to-right; the chain
            # is order-dependent, which is exactly why we SORT first
            o = np.lexsort((c, node))
            node, c = node[o], c[o]
            first = np.ones(node.shape[0], dtype=bool)
            first[1:] = node[1:] != node[:-1]
            un = node[first]
            # seed with the node's OWN current color
            acc = _mix(cl[np.searchsorted(nd, un)].astype(np.uint64))
            mc = _mix(c.astype(np.uint64))
            seg = np.cumsum(first) - 1
            # sequential within segment but vectorized across nodes:
            # iterate positions-within-segment (max neighbor count per
            # node bounds the loop, typically small for bounded-degree
            # graphs; the doc graph has degree <= ~6)
            pos = np.arange(node.shape[0], dtype=np.int64)
            seg_start = np.nonzero(first)[0]
            pos -= np.repeat(
                seg_start, np.diff(np.append(seg_start, node.shape[0]))
            )
            max_deg = int(pos.max()) + 1
            for step in range(max_deg):
                m = pos == step
                with np.errstate(over="ignore"):
                    upd = _mix(acc[seg[m]] ^ mc[m])
                acc[seg[m]] = upd
            return pa.table(
                {
                    "node": pa.array(un),
                    "new_c": pa.array(
                        (acc & MASK63).astype(np.int64)
                    ),
                }
            )

        out_refs = (
            edges.map_batches(emit, batch_format="pyarrow")
            .groupby("part")
            .map_groups(refine, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        col_ref = _scatter_i64.remote(nodes_ref, col_ref, "new_c", *out_refs)

    return ray.data.from_arrow_refs(
        [_emit_i64_table.remote(nodes_ref, col_ref, "doc_id", "wl_color")]
    )


def hits(
    edges: ray.data.Dataset, *, iters: int = 10
) -> ray.data.Dataset:
    """HITS hubs-and-authorities over a DIRECTED edge list (u, v) —
    iterative graph primitive #10.  Per round: auth(v) = sum of hub(u)
    over in-edges, hub(u) = sum of auth(v) over out-edges, each vector
    L2-normalized.  Reproducible to float64 tolerance (the pagerank
    precedent): the gather scatter-adds per-BATCH partials block by
    block, so re-blocking the edge input can drift the last ulp of the
    sums — tests pin at 1e-12 against dense power iteration, and any
    tighter claim would need per-row integerization (the repo's exact
    reduction discipline, not warranted for a power method).

    Scale posture: the pagerank shape — edges materialize once and
    stream per round, node state (hub, auth float64) broadcasts 16
    B/node, each half-round is one stateless map + one gather task (tree
    reduce at cluster scale).  Returns (doc_id, hub, authority)."""
    edges = edges.select_columns(["u", "v"]).materialize()

    @ray.remote
    def _nodes(*blocks: pa.Table) -> np.ndarray:
        parts = [
            np.concatenate(
                (
                    b["u"].to_numpy(zero_copy_only=False),
                    b["v"].to_numpy(zero_copy_only=False),
                )
            )
            for b in blocks
            if b.num_rows and "u" in b.column_names
        ]
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(parts)).astype(np.int64)

    # per-node state stays an ObjectRef end-to-end (round-5 discipline)
    nodes_ref = _nodes.remote(*edges.to_arrow_refs())
    n = ray.get(_arr_len.remote(nodes_ref))
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.nulls(0, pa.int64()),
                    "hub": pa.nulls(0, pa.float64()),
                    "authority": pa.nulls(0, pa.float64()),
                }
            )
        )
    hub_ref = _full_f64.remote(n, 1.0)
    auth_ref = _full_f64.remote(n, 1.0)

    @ray.remote
    def _gather_norm(nd: np.ndarray, *blocks: pa.Table) -> np.ndarray:
        out = np.zeros(nd.shape[0], dtype=np.float64)
        for b in blocks:
            if b.num_rows == 0 or "node" not in b.column_names:
                continue
            nn = b.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
            c = b.column("contrib").to_numpy(zero_copy_only=False)
            out[np.searchsorted(nd, nn)] += c
        nrm = float(np.sqrt(np.sum(out * out)))
        return out / nrm if nrm > 0.0 else out

    def _half(vec_ref, forward: bool):

        def contrib(batch: pa.Table, _v=vec_ref, _fw=forward) -> pa.Table:
            empty = pa.table(
                {
                    "node": pa.nulls(0, pa.int64()),
                    "contrib": pa.nulls(0, pa.float64()),
                }
            )
            if batch.num_rows == 0 or "u" not in batch.column_names:
                return empty
            nd = ray.get(nodes_ref)
            vv = ray.get(_v) if not isinstance(_v, np.ndarray) else _v
            u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            ui = np.searchsorted(nd, u)
            vi = np.searchsorted(nd, v)
            if _fw:  # auth(v) += hub(u)
                tgt, val = vi, vv[ui]
            else:  # hub(u) += auth(v)
                tgt, val = ui, vv[vi]
            uq, inv = np.unique(tgt, return_inverse=True)
            acc = np.zeros(uq.shape[0], dtype=np.float64)
            np.add.at(acc, inv, val)
            return pa.table(
                {"node": pa.array(nd[uq]), "contrib": pa.array(acc)}
            )

        blocks = (
            edges.map_batches(contrib, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        return _gather_norm.remote(nodes_ref, *blocks)

    for _ in range(iters):
        auth_ref = _half(hub_ref, True)
        hub_ref = _half(auth_ref, False)

    @ray.remote
    def _emit_hits(
        nd: np.ndarray, hub: np.ndarray, auth: np.ndarray
    ) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(nd, type=pa.int64()),
                "hub": pa.array(hub),
                "authority": pa.array(auth),
            }
        )

    return ray.data.from_arrow_refs(
        [_emit_hits.remote(nodes_ref, hub_ref, auth_ref)]
    )


# ---------------------------------------------------------------------------
# Betweenness centrality (Brandes) — iterative graph primitive #11
# ---------------------------------------------------------------------------


def _brandes_dependencies(
    nbrs_s: np.ndarray, starts: np.ndarray, stops: np.ndarray, src: int
) -> np.ndarray:
    """One Brandes (2001) source sweep over CSR, fully vectorized per
    BFS level: forward pass accumulates shortest-path counts sigma,
    backward pass accumulates dependencies delta (the public algorithm;
    no per-edge Python).  Returns the dependency vector (delta at the
    source itself is 0 by construction)."""
    n = starts.shape[0]
    dist = np.full(n, -1, dtype=np.int64)
    sigma = np.zeros(n, dtype=np.float64)
    dist[src] = 0
    sigma[src] = 1.0
    levels = [np.array([src], dtype=np.int64)]
    frontier = levels[0]
    while frontier.size:
        # gather all (v in frontier) -> neighbor pairs
        lens = stops[frontier] - starts[frontier]
        total = int(lens.sum())
        if total == 0:
            break
        vrep = np.repeat(frontier, lens)
        pos = np.repeat(starts[frontier], lens) + (
            np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
        )
        w = nbrs_s[pos]
        new = w[dist[w] < 0]
        if new.size:
            new = np.unique(new)
            dist[new] = dist[frontier[0]] + 1
        # sigma flows along edges that advance one level
        adv = dist[w] == dist[vrep] + 1
        np.add.at(sigma, w[adv], sigma[vrep[adv]])
        frontier = new
        if frontier.size:
            levels.append(frontier)
    delta = np.zeros(n, dtype=np.float64)
    for lvl in reversed(levels[1:]):
        lens = stops[lvl] - starts[lvl]
        total = int(lens.sum())
        if total == 0:
            continue
        vrep = np.repeat(lvl, lens)
        pos = np.repeat(starts[lvl], lens) + (
            np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
        )
        w = nbrs_s[pos]
        # predecessors of v are neighbors one level CLOSER to the source
        pred = dist[w] == dist[vrep] - 1
        contrib = (sigma[w[pred]] / sigma[vrep[pred]]) * (
            1.0 + delta[vrep[pred]]
        )
        np.add.at(delta, w[pred], contrib)
    # Brandes: the source's own dependency is never accumulated
    delta[src] = 0.0
    return delta


def betweenness(
    edges: ray.data.Dataset,
    *,
    n_sources: int | None = 64,
    sources_per_batch: int = 8,
) -> ray.data.Dataset:
    """Betweenness centrality over an undirected edge list (u, v) —
    iterative graph primitive #11.  ``n_sources=None`` runs EVERY node
    as a Brandes source (the exact algorithm); an integer runs the
    deterministic Lehmer-ordered sample of that many sources (the
    standard source-sampled estimator — scores are the exact dependency
    sums over the chosen sources, undirected double-count halved).

    Distributed plan (a NEW shape for this family): the CSR incidence
    (8 B/edge x 2 + 16 B/node) is built ONCE off-driver and broadcast
    by ref; the SOURCE LIST becomes a Dataset and map_batches fans the
    per-source sweeps across the cluster — each batch scatter-adds its
    sources' dependency vectors locally and emits ONE dense (node,
    partial) table, so the exchange is (#batches x n) rows regardless
    of source count; a gather task sums partials off-driver (pagerank
    posture: the driver never holds per-node state).  Returns (doc_id,
    betweenness)."""
    edges = edges.select_columns(["u", "v"]).materialize()
    edge_refs = edges.to_arrow_refs()

    @ray.remote
    def _nodes(*blocks: pa.Table) -> np.ndarray:
        parts = [
            np.concatenate(
                (
                    b["u"].to_numpy(zero_copy_only=False),
                    b["v"].to_numpy(zero_copy_only=False),
                )
            )
            for b in blocks
            if b.num_rows and "u" in b.column_names
        ]
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(parts)).astype(np.int64)

    nodes_ref = _nodes.remote(*edge_refs)
    n = ray.get(_arr_len.remote(nodes_ref))
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.nulls(0, pa.int64()),
                    "betweenness": pa.nulls(0, pa.float64()),
                }
            )
        )

    @ray.remote(num_returns=3)
    def _build_csr(nd: np.ndarray, *blocks: pa.Table):
        us = [
            b["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            for b in blocks
            if b.num_rows and "u" in b.column_names
        ]
        vs = [
            b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            for b in blocks
            if b.num_rows and "u" in b.column_names
        ]
        u = np.searchsorted(nd, np.concatenate(us))
        v = np.searchsorted(nd, np.concatenate(vs))
        return _csr(np.arange(nd.shape[0], dtype=np.int64), u, v)

    nbrs_ref, starts_ref, stops_ref = _build_csr.remote(nodes_ref, *edge_refs)

    @ray.remote
    def _pick_sources(nd: np.ndarray, k) -> np.ndarray:
        idx = np.arange(nd.shape[0], dtype=np.int64)
        if k is None or k >= nd.shape[0]:
            return idx
        # deterministic Lehmer-ordered sample (the repo's sampling hash)
        order = np.argsort((nd * np.int64(48271)) % np.int64(2147483647),
                           kind="stable")
        return np.sort(idx[order[:k]])

    src_ref = _pick_sources.remote(nodes_ref, n_sources)
    src_idx = ray.get(src_ref)  # source LIST only (<= n_sources ids, tiny)
    src_ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src_idx, type=pa.int64())})
    ).repartition(max(1, min(32, (src_idx.shape[0] + sources_per_batch - 1)
                             // sources_per_batch)))

    def sweep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "src" not in batch.column_names:
            return pa.table(
                {
                    "node": pa.nulls(0, pa.int64()),
                    "contrib": pa.nulls(0, pa.float64()),
                }
            )
        nbrs_s = ray.get(nbrs_ref)
        starts = ray.get(starts_ref)
        stops = ray.get(stops_ref)
        acc = np.zeros(starts.shape[0], dtype=np.float64)
        for s in batch["src"].to_numpy(zero_copy_only=False):
            acc += _brandes_dependencies(nbrs_s, starts, stops, int(s))
        return pa.table(
            {
                "node": pa.array(
                    np.arange(starts.shape[0], dtype=np.int64)
                ),
                "contrib": pa.array(acc),
            }
        )

    partial_refs = (
        src_ds.map_batches(sweep, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )

    @ray.remote
    def _emit(nd: np.ndarray, *blocks: pa.Table) -> pa.Table:
        out = np.zeros(nd.shape[0], dtype=np.float64)
        for b in blocks:
            if b.num_rows == 0 or "node" not in b.column_names:
                continue
            ni = b["node"].to_numpy(zero_copy_only=False)
            c = b["contrib"].to_numpy(zero_copy_only=False)
            out[ni] += c
        return pa.table(
            {
                "doc_id": pa.array(nd, type=pa.int64()),
                # undirected: each pair's dependency is counted from
                # both endpoints' sweeps when all sources run
                "betweenness": pa.array(out / 2.0),
            }
        )

    return ray.data.from_arrow_refs([_emit.remote(nodes_ref, *partial_refs)])

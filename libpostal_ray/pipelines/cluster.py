"""Distributed connected components over an edge Dataset.

The reference keeps its pair graph in an in-memory CSR (`graph.h:1-46`) —
fine for one process, impossible at 10^12 files.  Here: alternating
large-star / small-star min-label propagation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — the published pattern cited in
PAPERS.md), expressed as partitioned ``groupby().map_groups`` rounds over an
edge Dataset.  Converges in O(log n) rounds; every round is one shuffle keyed
by node id.

Physical layout: grouping by raw node id costs one Python call per node;
instead each round groups by ``u % P`` (P partitions) and recovers the
per-node segments with a vectorized sort + reduceat inside the partition —
all rows of a node land in one partition, so per-node minima are exact.

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


def _dedup_pairs(u: np.ndarray, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    if u.shape[0] == 0:
        return u, v
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    keep = np.concatenate(([True], (u[1:] != u[:-1]) | (v[1:] != v[:-1])))
    return u[keep], v[keep]


def _segments(us: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(seg_starts, seg_id_per_row) of a sorted key array."""
    starts = np.flatnonzero(np.concatenate(([True], us[1:] != us[:-1])))
    seg_id = np.cumsum(np.concatenate(([0], (us[1:] != us[:-1]).astype(np.int64))))
    return starts, seg_id


def _large_star_part(group: pa.Table) -> pa.Table:
    """Partition of symmetric edges. Per node u: m = min(u, neighbors);
    connect every neighbor > u to m."""
    u = group["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = group["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((v, u))
    us, vs = u[order], v[order]
    starts, seg_id = _segments(us)
    minv = np.minimum.reduceat(vs, starts)
    m = np.minimum(minv, us[starts])
    m_row = m[seg_id]
    mask = vs > us
    out_u, out_v = _dedup_pairs(vs[mask], m_row[mask])
    return _pairs_table(out_u, out_v)


def _small_star_part(group: pa.Table) -> pa.Table:
    """Partition of high->low directed edges (u > v). Per node u:
    m = min(neighbors); connect u and every neighbor != m to m."""
    u = group["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = group["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((v, u))
    us, vs = u[order], v[order]
    starts, seg_id = _segments(us)
    m = np.minimum.reduceat(vs, starts)
    m_row = m[seg_id]
    mask = vs != m_row
    out_u = np.concatenate([vs[mask], us[starts]])
    out_v = np.concatenate([m_row[mask], m])
    out_u, out_v = _dedup_pairs(out_u, out_v)
    return _pairs_table(out_u, out_v)


def _symmetrize(batch: pa.Table) -> pa.Table:
    if "u" not in batch.column_names:
        return _EDGE_SCHEMA.empty_table()
    u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    return _pairs_table(np.concatenate([u, v]), np.concatenate([v, u]))


def _direct_high_low(batch: pa.Table) -> pa.Table:
    u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = u != v
    u, v = u[keep], v[keep]
    return _pairs_table(np.maximum(u, v), np.minimum(u, v))


def _with_part(P: int):
    def add(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        return batch.append_column("part", pa.array((u % P).astype("int64")))

    return add


def _drop_part(batch: pa.Table) -> pa.Table:
    return batch.drop_columns(["part"]) if "part" in batch.column_names else batch


def _checksum(ds: ray.data.Dataset) -> tuple[int, int, int]:
    """(row_count, order-independent checksum lo, hi) of an edge dataset.

    Each row hash is split into two 30-bit halves before the Sum aggregate:
    int64 sums of 30-bit values stay exact up to 2^33 rows (a single CC edge
    set never exceeds that per partitioned sum at any plausible scale; and a
    checksum collision only delays convergence detection by one round)."""
    from ray.data.aggregate import Sum, Count

    MASK30 = np.int64((1 << 30) - 1)

    def add_mix(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (u * np.uint64(0x9E3779B97F4A7C15) ^ v) * np.uint64(0x100000001B3)
        h = (h >> np.uint64(2)).astype(np.int64)
        return pa.table(
            {
                "lo": pa.array(h & MASK30),
                "hi": pa.array((h >> np.int64(31)) & MASK30),
            }
        )

    res = ds.map_batches(add_mix, batch_format="pyarrow").aggregate(
        Count(alias_name="n"),
        Sum("lo", alias_name="lo"),
        Sum("hi", alias_name="hi"),
    )
    return int(res["n"]), int(res["lo"] or 0), int(res["hi"] or 0)


def _cc_vectorized(u: np.ndarray, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """In-memory connected components: min-label hooking + pointer jumping
    (Shiloach-Vishkin style), fully vectorized.  Returns (nodes, labels) with
    label = min node id of the component."""
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[: u.shape[0]], inv[u.shape[0] :]
    parent = np.arange(nodes.shape[0], dtype=np.int64)
    while True:
        pu, pv = parent[ui], parent[vi]
        if (pu == pv).all():
            break
        lo = np.minimum(pu, pv)
        hi = np.maximum(pu, pv)
        np.minimum.at(parent, hi, lo)
        while True:
            pp = parent[parent]
            if np.array_equal(pp, parent):
                break
            parent = pp
    # nodes are sorted, so the min parent INDEX is the min node id
    return nodes, nodes[parent]


@ray.remote
def _cc_task(*blocks) -> pa.Table:
    # zero-row blocks can be schema-less (Ray skips empty blocks in
    # map_batches, so the (u,v) conversion never saw them) — drop them
    t = pa.concat_tables(
        [b for b in blocks if b.num_rows > 0 and "u" in b.column_names]
        or [_EDGE_SCHEMA.empty_table()]
    )
    u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes, labels = _cc_vectorized(u, v)
    return pa.table(
        {
            "doc_id": pa.array(nodes, type=pa.int64()),
            "cluster_id": pa.array(labels, type=pa.int64()),
        }
    )


@ray.remote
def _cc_task_from_edges(min_status: int, *blocks) -> pa.Table:
    """Single-task CC straight from EDGE blocks (src, dst, status, ...):
    the status filter and the (u,v) conversion run inside the task, so the
    whole local path costs ONE Ray job instead of three (filter map +
    convert map + CC).  Used by the fused fast path in near_dupe_pipeline."""
    import os
    import sys
    import time

    _t0 = time.perf_counter()
    import numpy as np

    parts = []
    for b in blocks:
        if b.num_rows == 0 or "src" not in b.column_names:
            continue
        st = b["status"].to_numpy(zero_copy_only=False)
        keep = st >= min_status
        if keep.any():
            parts.append(
                (
                    b["src"].to_numpy(zero_copy_only=False)[keep],
                    b["dst"].to_numpy(zero_copy_only=False)[keep],
                )
            )
    if not parts:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "cluster_id": pa.array([], type=pa.int64()),
            }
        )
    _t1 = time.perf_counter()
    u = np.concatenate([p[0] for p in parts]).astype(np.int64)
    v = np.concatenate([p[1] for p in parts]).astype(np.int64)
    nodes, labels = _cc_vectorized(u, v)
    if os.environ.get("GRAFT_PHASE_LOG") == "1":
        print(
            f"[phase-task] cc_task filter {_t1 - _t0:.2f}s"
            f" + cc {time.perf_counter() - _t1:.2f}s ({u.shape[0]} edges,"
            f" {len(blocks)} blocks)",
            file=sys.stderr,
        )
    return pa.table(
        {
            "doc_id": pa.array(nodes, type=pa.int64()),
            "cluster_id": pa.array(labels, type=pa.int64()),
        }
    )


# crossover between the single-task vectorized CC and the distributed
# large/small-star rounds: below this many edges the whole graph fits one
# worker comfortably (~16 B/edge => 5e7 edges ~ 800 MB) and a single task
# beats O(log n) shuffle rounds by an order of magnitude in wall time
CC_LOCAL_MAX_EDGES = 50_000_000


def connected_components(
    edges: ray.data.Dataset,
    max_rounds: int = 30,
    partitions: int = 64,
    checkpoint_dir: str | None = None,
    local_max_edges: int | None = None,
    config_fp: str | None = None,
) -> ray.data.Dataset:
    """edges (src: int64, dst: int64, ...) -> labels (doc_id: int64,
    cluster_id: int64) for every node that appears in an edge.

    cluster_id = min doc_id of the component.  Nodes not present in any edge
    are absent (callers assign label=self via a left join — see
    ``assign_clusters``).

    Hybrid execution: edge sets under CC_LOCAL_MAX_EDGES run as ONE Ray task
    (vectorized hooking + pointer jumping); larger sets run the distributed
    large-star/small-star rounds.  Both are deterministic min-label.

    With ``checkpoint_dir``, every completed distributed ROUND persists its
    edge state (parquet + manifest committed atomically after the data); a
    killed run resumes from the last committed round instead of replaying
    the O(log n) shuffle chain.  Rounds are deterministic, so a resumed run
    produces bit-identical labels."""
    import json
    import os
    import shutil

    cur = edges.map_batches(
        lambda b: _pairs_table(
            b["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
        ),
        batch_format="pyarrow",
    ).materialize()

    n_edges = cur.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.schema(
                [("doc_id", pa.int64()), ("cluster_id", pa.int64())]
            ).empty_table()
        )
    local_max = CC_LOCAL_MAX_EDGES if local_max_edges is None else local_max_edges
    if n_edges <= local_max:
        refs = cur.to_arrow_refs()
        tbl = ray.get(_cc_task.remote(*refs))
        return ray.data.from_arrow(tbl)

    ck_dir = manifest_path = None
    manifest: dict = {"rounds": {}}
    start_round = 0
    prev_sig = None
    if checkpoint_dir is not None:
        ck_dir = os.path.join(checkpoint_dir, "cc_rounds")
        os.makedirs(ck_dir, exist_ok=True)
        manifest_path = os.path.join(ck_dir, "manifest.json")
        # manifest validity = (config fingerprint, input edge-set signature):
        # a converged manifest from an earlier run with a different corpus or
        # config would otherwise short-circuit straight to stale labels
        # (mirrors StageCheckpoint._load's invalidation contract).
        input_sig = list(_checksum(cur))
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                manifest = json.load(f)
            if (
                manifest.get("config_fp") != config_fp
                or manifest.get("input_sig") != input_sig
            ):
                shutil.rmtree(ck_dir, ignore_errors=True)
                os.makedirs(ck_dir, exist_ok=True)
                manifest = {"rounds": {}}
        manifest["config_fp"] = config_fp
        manifest["input_sig"] = input_sig
        done = sorted(int(r) for r in manifest["rounds"])
        if done:
            last = done[-1]
            entry = manifest["rounds"][str(last)]
            cur = ray.data.read_parquet(
                os.path.join(ck_dir, f"round={last}")
            ).materialize()
            start_round = last + 1
            ps = entry.get("prev_sig")
            prev_sig = tuple(ps) if ps else (entry["n"], None)
            if entry.get("converged"):
                start_round = max_rounds  # skip straight to label extraction

    add_part = _with_part(partitions)
    for rnd in range(start_round, max_rounds):
        cur = (
            cur.map_batches(_symmetrize, batch_format="pyarrow")
            .map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(_large_star_part, batch_format="pyarrow")
        )
        cur = (
            cur.map_batches(_direct_high_low, batch_format="pyarrow")
            .map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(_small_star_part, batch_format="pyarrow")
        )
        cur = cur.materialize()
        # convergence: count() on a materialized dataset is free metadata —
        # only pay for the checksum job once the count stops moving
        n = cur.count()
        converged = False
        if prev_sig is not None and n == prev_sig[0]:
            sig = _checksum(cur)
            if sig == prev_sig:
                converged = True
            prev_sig = sig
        else:
            prev_sig = (n, None)
        if ck_dir is not None:
            rdir = os.path.join(ck_dir, f"round={rnd}")
            tmp = rdir + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            cur.write_parquet(tmp)
            shutil.rmtree(rdir, ignore_errors=True)
            os.replace(tmp, rdir)
            manifest["rounds"][str(rnd)] = {
                "n": n,
                "prev_sig": list(prev_sig) if prev_sig[1] is not None else None,
                "converged": converged,
            }
            mtmp = manifest_path + ".tmp"
            with open(mtmp, "w") as f:
                json.dump(manifest, f, indent=1)
            os.replace(mtmp, manifest_path)  # commit AFTER the round data
        if converged:
            break

    # converged: star edges (node -> root). label(node) = its root; the root
    # labels itself.
    def to_labels(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.concatenate([u, v])
        lab = np.concatenate([v, v])
        node, lab = _dedup_pairs(node, lab)
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
    partitions than CPUs stalls a small cluster, and actor startup cost grows
    with the count.  Clamp to cpus/4 (on a real multi-node cluster
    `requested` wins)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(2, min(requested, cpus // 4))


# label sets under this row count are broadcast (ray.put once, searchsorted
# lookup per batch — no shuffle); 2 x 8 B x 2e7 = ~320 MB object
ASSIGN_BROADCAST_MAX = 20_000_000


@ray.remote
def _nrows_of(block: pa.Table) -> int:
    """Row count of one Arrow block — the cheap alternative to a Ray Data
    ``count()`` job (which spins up a whole streaming executor) when the
    caller already holds the block refs."""
    return block.num_rows


@ray.remote
def _assign_blocks_task(labels: pa.Table, columns, *blocks: pa.Table) -> pa.Table:
    """Label a group of doc blocks against the (sorted) label table — the
    raw-task body behind ``assign_clusters_blocks``.  ``labels`` arrives as
    a resolved top-level ObjectRef arg (one shared plasma read per task)."""
    import os
    import sys
    import time

    _t0 = time.perf_counter()
    node = labels["doc_id"].to_numpy(zero_copy_only=False)
    lab = labels["cluster_id"].to_numpy(zero_copy_only=False)
    outs = []
    for b in blocks:
        t = b.select(columns) if columns else b
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if node.shape[0] == 0:
            cid = ids
        else:
            pos = np.searchsorted(node, ids)
            pos_c = np.clip(pos, 0, node.shape[0] - 1)
            hit = (pos < node.shape[0]) & (node[pos_c] == ids)
            cid = np.where(hit, lab[pos_c], ids)
        outs.append(t.append_column("cluster_id", pa.array(cid, type=pa.int64())))
    if os.environ.get("GRAFT_PHASE_LOG") == "1":
        print(
            f"[phase-task] assign_task {time.perf_counter() - _t0:.2f}s"
            f" ({len(blocks)} blocks)",
            file=sys.stderr,
        )
    return pa.concat_tables(outs)


def assign_clusters_blocks(
    block_refs: list,
    labels_ref,
    columns: list[str] | None = None,
    n_tasks: int | None = None,
    as_refs: bool = False,
):
    """Cluster assignment as RAW tasks over doc block refs, chained on the
    label ObjectRef: the tasks are submitted before the CC task finishes,
    so Ray starts them the instant labels resolve — no Ray Data job
    startup, no per-block task overhead, no driver wake-up in between.
    One task per CPU (each labels several blocks).

    ``as_refs=True`` returns the raw output refs (submission only, no
    blocking) so the caller can overlap other driver work before wrapping
    them in a Dataset (from_arrow_refs blocks on metadata)."""
    cpus = int(ray.cluster_resources().get("CPU", 4))
    n = max(1, min(len(block_refs), n_tasks or cpus))
    groups = [block_refs[i::n] for i in range(n)]
    refs = [_assign_blocks_task.remote(labels_ref, columns, *g) for g in groups]
    if as_refs:
        return refs
    return ray.data.from_arrow_refs(refs)


def assign_clusters_ref(docs: ray.data.Dataset, labels_ref) -> ray.data.Dataset:
    """Broadcast-only cluster assignment taking the label TABLE by
    ObjectRef (e.g. straight from _cc_task_from_edges) — no label dataset,
    no driver-side concat, no extra Ray jobs; one map over docs."""

    def lookup(batch: pa.Table) -> pa.Table:
        tbl = ray.get(labels_ref) if not isinstance(labels_ref, pa.Table) else labels_ref
        node = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = tbl["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if node.shape[0] == 0:
            return batch.append_column("cluster_id", pa.array(ids, type=pa.int64()))
        # nodes from _cc_vectorized are sorted (np.unique)
        pos = np.searchsorted(node, ids)
        pos_c = np.clip(pos, 0, node.shape[0] - 1)
        hit = (pos < node.shape[0]) & (node[pos_c] == ids)
        cid = np.where(hit, lab[pos_c], ids)
        return batch.append_column("cluster_id", pa.array(cid, type=pa.int64()))

    return docs.map_batches(lookup, batch_format="pyarrow")


@ray.remote
def _build_label_state(*blocks) -> dict:
    """Sort the (doc_id, cluster_id) label table for searchsorted lookup in
    a worker, not the driver (the _build_sig_state discipline).  Empty
    blocks may arrive schema-less (zero-row datasets lose their schema)."""
    import numpy as np

    parts = [
        b.select(["doc_id", "cluster_id"])
        for b in blocks
        if b.num_rows > 0 and "doc_id" in b.column_names
    ]
    if not parts:
        return {
            "node": np.empty(0, dtype=np.int64),
            "lab": np.empty(0, dtype=np.int64),
        }
    t = pa.concat_tables(parts)
    node = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    lab = t["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(node, kind="stable")
    return {"node": node[order], "lab": lab[order]}


def assign_clusters(
    docs: ray.data.Dataset,
    labels: ray.data.Dataset,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Attach cluster ids to docs; unlabeled docs are singletons
    (cluster_id = doc_id).

    Hybrid: small label sets (the common case — only docs that appear in a
    verified edge are labeled) are broadcast via ray.put and looked up with a
    vectorized searchsorted inside map_batches; label sets too big to
    broadcast fall back to the hash-partitioned left join."""
    labels = labels.materialize()
    if labels.count() <= ASSIGN_BROADCAST_MAX:
        # the label table (up to ASSIGN_BROADCAST_MAX rows, ~320 MB at the
        # cap) sorts in a REMOTE task over the label block refs — the same
        # off-driver build discipline as _build_sig_state; the driver never
        # concatenates it
        ref = _build_label_state.remote(*labels.to_arrow_refs())

        def lookup(batch: pa.Table) -> pa.Table:
            state = ray.get(ref)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            if state["node"].shape[0] == 0:
                # no labeled docs at all: every doc is a singleton
                cid = ids
                return batch.append_column(
                    "cluster_id", pa.array(cid, type=pa.int64())
                )
            pos = np.searchsorted(state["node"], ids)
            pos_c = np.clip(pos, 0, state["node"].shape[0] - 1)
            hit = (pos < state["node"].shape[0]) & (state["node"][pos_c] == ids)
            cid = np.where(hit, state["lab"][pos_c], ids)
            return batch.append_column(
                "cluster_id", pa.array(cid, type=pa.int64())
            )

        return docs.map_batches(lookup, batch_format="pyarrow")

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

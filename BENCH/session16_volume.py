"""Correctness-at-volume for the session-16 operators:

* 10M synthetic events — user_time_weighted_value (200k users) and
  events_cusum_changepoint, both EXACT vs DuckDB SQL over the same
  parquet (the TWA moments are per-user BIGINTs; the 90-day span keeps
  max|milli| x user-span < 2^62 by construction, same bound the
  operator loud-checks);
* 1M-document deterministic graph (~3M edges) — doc_graph_mst EXACT
  vs an independent dict-based Kruskal under the same (w, u, v) total
  order (edge-set equality, not just total weight), and doc_graph_kcore
  cross-checked against an INDEPENDENT algorithm: the Batagelj-
  Zaversnik O(E) bucket peel (node-at-a-time degree-bin queue, nothing
  shared with the operator's vectorized frontier waves).

Valid in any host window (exactness, not wall time, is the claim);
walls are printed for the record.

Usage: python BENCH/session16_volume.py [n_events]
"""

import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
N_DOC = max(N // 10, 10)
N_USER = 200_000
DIR = "/tmp/s16_volume"

GOLD = np.uint64(0x9E3779B97F4A7C15)
MASK63 = np.uint64((1 << 63) - 1)
E_TYPES = ["click", "view", "purchase", "signup"]


def _h(i: np.ndarray, salt: int) -> np.ndarray:
    z = (i + np.uint64(salt)) * GOLD
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return (z ^ (z >> np.uint64(31))) & MASK63


def gen():
    os.makedirs(DIR, exist_ok=True)
    if os.path.exists(f"{DIR}/events.parquet"):
        return
    base = np.int64(789_000_000_000_000)
    span = np.uint64(90) * np.uint64(86_400_000_000)  # 90 days in us
    B = 1_000_000

    writer = None
    for lo in range(0, N_DOC, B):
        i = np.arange(lo, min(lo + B, N_DOC), dtype=np.uint64)
        h = _h(i, 11)
        t = pa.table({
            "doc_id": pa.array(i.astype(np.int64)),
            "n_chars": pa.array((h % 20_000).astype(np.int64)),
        })
        if writer is None:
            writer = pq.ParquetWriter(f"{DIR}/documents.parquet", t.schema)
        writer.write_table(t)
    writer.close()

    writer = None
    for lo in range(0, N, B):
        i = np.arange(lo, min(lo + B, N), dtype=np.uint64)
        h = _h(i, 12)
        t = pa.table({
            "event_id": pa.array(i.astype(np.int64)),
            "ts": pa.array(
                base + ((h >> np.uint64(13)) % span).astype(np.int64)
            ).cast(pa.timestamp("us")),
            "user_id": pa.array((h % np.uint64(N_USER)).astype(np.int64)),
            "event_type": pa.array(
                [E_TYPES[int(v)] for v in (h >> np.uint64(5)) % 4],
                type=pa.string()),
            # value < 100 so max milli (99,990) x the 90-day span
            # (7.8e12 us) stays ~7.8e17 < 2^62 — the operator's bound
            "value": pa.array(
                ((h >> np.uint64(29)) % 10_000).astype(np.float64) / 100.0),
        })
        if writer is None:
            writer = pq.ParquetWriter(f"{DIR}/events.parquet", t.schema)
        writer.write_table(t)
    writer.close()


def _kruskal_forest(u, v, w):
    """Independent dict-based Kruskal under the (w, u, v) total order."""
    order = np.lexsort((v, u, w))
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    out = []
    for i in order:
        a, b = find(int(u[i])), find(int(v[i]))
        if a != b:
            parent[a] = b
            out.append((int(w[i]), int(u[i]), int(v[i])))
    return out


def _bz_coreness(u, v):
    """Independent coreness via the Batagelj-Zaversnik bucket peel
    (O(E), node-at-a-time with a degree-bin queue — algorithmically
    disjoint from the operator's vectorized frontier waves).  The
    h-index fixpoint was tried first and is NOT usable at this scale:
    its round count tracks the longest peel cascade (the skip edges
    make id-consecutive chains), so 1M nodes needs ~1e5 full O(E)
    passes."""
    node = np.unique(np.concatenate((u, v)))
    n = node.shape[0]
    ui = np.searchsorted(node, u)
    vi = np.searchsorted(node, v)
    ends = np.concatenate((ui, vi))
    nbrs = np.concatenate((vi, ui))
    order = np.argsort(ends, kind="stable")
    ends_s, nbrs_s = ends[order], nbrs[order]
    starts = np.searchsorted(ends_s, np.arange(n))
    deg = np.diff(np.append(starts, ends_s.shape[0])).astype(np.int64)
    # bin sort by degree
    md = int(deg.max()) if n else 0
    bins = np.zeros(md + 2, dtype=np.int64)
    np.add.at(bins, deg + 1, 1)
    np.cumsum(bins, out=bins)
    pos = np.empty(n, dtype=np.int64)
    vert = np.empty(n, dtype=np.int64)
    fill = bins[:-1].copy()
    for x in range(n):
        pos[x] = fill[deg[x]]
        vert[pos[x]] = x
        fill[deg[x]] += 1
    binstart = bins[:-1]
    d = deg.copy()
    core = np.zeros(n, dtype=np.int64)
    for i in range(n):
        x = int(vert[i])
        core[x] = d[x]
        for s in range(int(starts[x]),
                       int(starts[x]) + int(deg[x])):
            y = int(nbrs_s[s])
            if d[y] > d[x]:
                # swap y to the front of its bin, shrink the bin
                dy = d[y]
                front = int(binstart[dy])
                z = int(vert[front])
                py = int(pos[y])
                vert[front], vert[py] = y, z
                pos[y], pos[z] = front, py
                binstart[dy] += 1
                d[y] -= 1
    return node, core


def main():
    import duckdb
    import pandas as pd
    import ray

    gen()
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sql = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{DIR}/{t}.parquet'")

    # ---- oracle rows vs DuckDB ----
    for name in ("user_time_weighted_value", "events_cusum_changepoint",
                 "events_mannwhitney"):
        t0 = time.time()
        res = qs[name](DIR)
        got = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        rw = time.time() - t0
        t0 = time.time()
        want = con.sql(sql[name]).df()
        dw = time.time() - t0
        cols = sorted(got.columns)
        assert cols == sorted(want.columns), (name, cols)
        got = got[cols].sort_values(cols).reset_index(drop=True)
        want = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(got) == len(want), (name, len(got), len(want))
        for c in cols:
            a, b = got[c].to_numpy(), want[c].to_numpy()
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                af, bf = a.astype(np.float64), b.astype(np.float64)
                assert ((af == bf) | (np.isnan(af) & np.isnan(bf))).all(), (
                    name, c, "float mismatch")
            else:
                assert (a.astype(str) == b.astype(str)).all(), (name, c)
        print(f"{name}: {len(got)} rows EXACT "
              f"(ray {rw:.1f}s, duckdb {dw:.1f}s)", flush=True)

    # ---- graph rows vs independent references ----
    from libpostal_ray.pipelines.queries import _doc_graph_edges, doc_graph_mst

    t0 = time.time()
    mst = doc_graph_mst(DIR).to_pandas()
    rw = time.time() - t0
    edges, _n = _doc_graph_edges(DIR)
    et = edges.to_pandas()
    u = et.u.to_numpy().astype(np.int64)
    v = et.v.to_numpy().astype(np.int64)
    w = ((u * 31 + v * 7) % 97 + 1).astype(np.int64)
    t0 = time.time()
    ref = _kruskal_forest(u, v, w)
    kw = time.time() - t0
    got_set = list(zip(mst.w.astype(int), mst.u.astype(int), mst.v.astype(int)))
    assert sorted(got_set) == sorted(ref), "MST edge set mismatch"
    print(f"doc_graph_mst: {len(ref)} edges over {u.size} EXACT vs Kruskal "
          f"(ray {rw:.1f}s, kruskal {kw:.1f}s)", flush=True)

    from libpostal_ray.pipelines.graph import coreness

    t0 = time.time()
    core = coreness(edges).to_pandas()
    rw = time.time() - t0
    t0 = time.time()
    node, c_ref = _bz_coreness(u, v)
    hw = time.time() - t0
    core = core.sort_values("doc_id").reset_index(drop=True)
    assert (core.doc_id.to_numpy() == node).all()
    assert (core.coreness.to_numpy() == c_ref).all(), "coreness mismatch"
    print(f"coreness: {node.size} nodes EXACT vs Batagelj-Zaversnik "
          f"(ray {rw:.1f}s, bz {hw:.1f}s)", flush=True)

    ray.shutdown()


if __name__ == "__main__":
    main()

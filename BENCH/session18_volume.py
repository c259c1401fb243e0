"""Correctness-at-volume for the session-18 operators:

* 1M-document deterministic graph (~3M edges) — doc_graph_sssp EXACT
  vs an independent heap Dijkstra (nothing shared with the BSP frontier
  relaxation or the SQL recursion); d_max raised to 96 so the radius
  covers the deeper 1M-node tree (depth ~20, max tree-path weight ~60).
* 10M synthetic events — event_click_auc EXACT vs DuckDB's window-rank
  formulation (doubled midranks at 10M rows: u2 ~ 2*n1*n0 ~ 3.8e13,
  far under the loud-checked 2^62 bound); user_event_count_cms checked
  for the CM guarantees vs exact DuckDB counts (never undercounts;
  per-probe overshoot <= (e/width)*N holds w.p. 1-e^-4 per probe, so
  <= 5 of 100 probes may exceed it).
* 2M-part dimension volume — tpch_q2_min_cost_supplier EXACT vs DuckDB
  over 2M parts x 10k suppliers (the derived-partsupp cost matrix).

Valid in any host window (exactness, not wall time, is the claim);
walls are printed for the record.

Usage: python BENCH/session18_volume.py [n_events]
"""

import heapq
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
N_DOC = max(N // 10, 10)
N_PART = max(N // 5, 10)
N_SUPP = 10_000
N_USER = 200_000
DIR = "/tmp/s18_volume"

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
    B = 1_000_000
    if not os.path.exists(f"{DIR}/documents.parquet"):
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

    if not os.path.exists(f"{DIR}/events.parquet"):
        base = np.int64(789_000_000_000_000)
        span = np.uint64(90) * np.uint64(86_400_000_000)
        writer = None
        for lo in range(0, N, B):
            i = np.arange(lo, min(lo + B, N), dtype=np.uint64)
            h = _h(i, 12)
            # type from an INDEPENDENT hash: N_USER = 2^6 x 3125, so
            # h % N_USER pins bits 0-5 of h and (h >> 5) % 4 would fix
            # half the type selector PER USER (no user would ever have
            # both 'signup' and 'purchase' — found by the KM operator
            # returning an empty study at volume)
            h2 = _h(i, 15)
            t = pa.table({
                "event_id": pa.array(i.astype(np.int64)),
                "ts": pa.array(
                    base + ((h >> np.uint64(13)) % span).astype(np.int64)
                ).cast(pa.timestamp("us")),
                "user_id": pa.array((h % np.uint64(N_USER)).astype(np.int64)),
                "event_type": pa.array(
                    [E_TYPES[int(v)] for v in h2 % 4],
                    type=pa.string()),
                "value": pa.array(
                    ((h >> np.uint64(29)) % 10_000).astype(np.float64)
                    / 100.0),
            })
            if writer is None:
                writer = pq.ParquetWriter(f"{DIR}/events.parquet", t.schema)
            writer.write_table(t)
        writer.close()

    if not os.path.exists(f"{DIR}/part.parquet"):
        writer = None
        for lo in range(0, N_PART, B):
            i = np.arange(lo, min(lo + B, N_PART), dtype=np.uint64)
            h = _h(i, 13)
            t = pa.table({
                "p_partkey": pa.array(i.astype(np.int64)),
                "p_name": pa.array(
                    [f"part {int(x)}" for x in i], type=pa.string()),
                "p_brand": pa.array(
                    [f"Brand#{int(x) % 25}" for x in h % 25],
                    type=pa.string()),
                "p_type": pa.array(
                    [f"TYPE {int(x) % 6}" for x in h % 6], type=pa.string()),
                "p_size": pa.array((h % 50).astype(np.int64) + 1),
                "p_retailprice": pa.array(
                    (900.0 + (h % np.uint64(120_000)).astype(np.float64))
                    / 100.0 * 2.0),
            })
            if writer is None:
                writer = pq.ParquetWriter(f"{DIR}/part.parquet", t.schema)
            writer.write_table(t)
        writer.close()

        i = np.arange(N_SUPP, dtype=np.uint64)
        h = _h(i, 14)
        pq.write_table(pa.table({
            "s_suppkey": pa.array(i.astype(np.int64)),
            "s_name": pa.array(
                [f"Supplier#{int(x):09d}" for x in i], type=pa.string()),
            "s_nationkey": pa.array((h % 25).astype(np.int64)),
            "s_acctbal": pa.array(
                ((h >> np.uint64(7)) % np.uint64(1_000_000)).astype(
                    np.float64) / 100.0),
        }), f"{DIR}/supplier.parquet")
        pq.write_table(pa.table({
            "n_nationkey": pa.array(np.arange(25, dtype=np.int64)),
            "n_name": pa.array(
                [f"NATION_{k}" for k in range(25)], type=pa.string()),
            "n_regionkey": pa.array(
                (np.arange(25, dtype=np.int64) % 5)),
        }), f"{DIR}/nation.parquet")
        pq.write_table(pa.table({
            "r_regionkey": pa.array(np.arange(5, dtype=np.int64)),
            "r_name": pa.array(
                ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
                type=pa.string()),
        }), f"{DIR}/region.parquet")


def _ref_dijkstra(d_max: int) -> dict:
    tbl = pq.read_table(f"{DIR}/documents.parquet",
                        columns=["doc_id", "n_chars"])
    n = tbl.num_rows
    k = tbl["doc_id"].to_numpy(zero_copy_only=False) + 1
    nc = tbl["n_chars"].to_numpy(zero_copy_only=False)
    us, vs = [], []
    for tgt in (2 * k, 2 * k + 1, k + 1 + (nc % 64)):
        m = tgt <= n
        us.append(k[m])
        vs.append(tgt[m])
    u = np.concatenate(us)
    v = np.concatenate(vs)
    w = 1 + (u + v) % 3
    order = np.argsort(u, kind="stable")
    u, v, w = u[order], v[order], w[order]
    starts = np.searchsorted(u, np.arange(n + 2))
    INF = 1 << 62
    dist = np.full(n + 1, INF, dtype=np.int64)
    dist[1] = 0
    heap = [(0, 1)]
    while heap:
        d, x = heapq.heappop(heap)
        if d > dist[x]:
            continue
        for s in range(starts[x], starts[x + 1]):
            nd = d + int(w[s])
            y = int(v[s])
            if nd <= d_max and nd < dist[y]:
                dist[y] = nd
                heapq.heappush(heap, (nd, y))
    hit = np.nonzero(dist <= d_max)[0]
    return {int(x) - 1: int(dist[x]) for x in hit}


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
    from libpostal_ray.pipelines.queries import (
        doc_graph_sssp,
        user_event_count_cms,
    )

    qs = entrymod.queries()
    sql = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in ("documents", "events", "part", "supplier", "nation", "region"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{DIR}/{t}.parquet'")

    # ---- SSSP at 1M nodes vs heap Dijkstra ----
    D_MAX = 96
    t0 = time.time()
    got = doc_graph_sssp(DIR, d_max=D_MAX).sort_values("doc_id")
    rw = time.time() - t0
    t0 = time.time()
    ref = _ref_dijkstra(D_MAX)
    dw = time.time() - t0
    gd = dict(zip(got.doc_id.astype(int), got.dist.astype(int)))
    assert gd == ref, (
        f"sssp MISMATCH: {len(gd)} vs {len(ref)} reached"
    )
    print(f"doc_graph_sssp: {len(gd)} of {N_DOC} nodes within {D_MAX} "
          f"EXACT vs Dijkstra (ray {rw:.1f} s, dijkstra {dw:.1f} s)")

    # ---- exact AUC at 10M events vs DuckDB ----
    name = "event_click_auc"
    t0 = time.time()
    got = qs[name](DIR)
    rw = time.time() - t0
    t0 = time.time()
    want = con.sql(sql[name]).df()
    dw = time.time() - t0
    cols = sorted(got.columns)
    got = got[cols].reset_index(drop=True)
    want = want[cols].reset_index(drop=True)
    assert len(got) == len(want) == 1
    for c in cols:
        assert got[c].iloc[0] == want[c].iloc[0], (c, got[c], want[c])
    print(f"event_click_auc: auc={got.auc.iloc[0]:.6f} over {N} rows "
          f"EXACT incl. the float (ray {rw:.1f} s, duckdb {dw:.1f} s)")

    # ---- CMS guarantees at 10M events vs exact counts ----
    t0 = time.time()
    est = user_event_count_cms(DIR).sort_values("user_id")
    rw = time.time() - t0
    exact = con.sql(
        f"SELECT user_id, count(*) AS c FROM events "
        f"WHERE user_id < 100 GROUP BY 1"
    ).df().set_index("user_id")["c"]
    bound = np.e / 2048 * N
    over = 0
    for uid, e_ in zip(est.user_id, est.est_count):
        true = int(exact.get(uid, 0))
        assert e_ >= true, f"cms UNDERCOUNT at user {uid}: {e_} < {true}"
        if e_ - true > bound:
            over += 1
    assert over <= 5, f"cms: {over} of 100 probes above the eN bound"
    print(f"user_event_count_cms: 100 probes at {N} rows, 0 undercounts, "
          f"{over} above the eps*N bound (allowed 5; ray {rw:.1f} s)")

    # ---- label propagation at 1M nodes vs dict reference ----
    from collections import Counter, defaultdict

    from libpostal_ray.pipelines.queries import doc_graph_communities

    LPA_ROUNDS = 4
    t0 = time.time()
    got_lpa = doc_graph_communities(DIR, rounds=LPA_ROUNDS).to_pandas()
    rw = time.time() - t0
    t0 = time.time()
    tbl = pq.read_table(f"{DIR}/documents.parquet",
                        columns=["doc_id", "n_chars"])
    nn = tbl.num_rows
    kk = tbl["doc_id"].to_numpy(zero_copy_only=False) + 1
    nc = tbl["n_chars"].to_numpy(zero_copy_only=False)
    adj = defaultdict(set)
    for tgt in (2 * kk, 2 * kk + 1, kk + 1 + (nc % 64)):
        m = tgt <= nn
        for a, b in zip(kk[m].tolist(), tgt[m].tolist()):
            adj[a].add(b)
            adj[b].add(a)
    lab = {x: x for x in adj}
    for _ in range(LPA_ROUNDS):
        nxt = {}
        for x, nb in adj.items():
            c = Counter(lab[y] for y in nb)
            c[lab[x]] += 1
            best = max(c.values())
            nxt[x] = min(l for l, k2 in c.items() if k2 == best)
        lab = nxt
    dw = time.time() - t0
    gd = dict(zip(got_lpa.doc_id.astype(int), got_lpa.community.astype(int)))
    assert gd == lab, "label_propagation MISMATCH vs dict reference"
    ncomm = len(set(lab.values()))
    print(f"doc_graph_communities: {len(gd)} nodes, {ncomm} communities "
          f"after {LPA_ROUNDS} rounds EXACT vs dict LPA "
          f"(ray {rw:.1f} s, dict {dw:.1f} s)")

    # ---- WL refinement at 1M nodes vs dict reference ----
    from libpostal_ray.pipelines.queries import doc_graph_wl_colors

    M64 = (1 << 64) - 1
    M63 = (1 << 63) - 1

    def _pmix(z):
        z = (z + 0x9E3779B97F4A7C15) & M64
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
        return z ^ (z >> 31)

    WL_ROUNDS = 2
    t0 = time.time()
    got_wl = doc_graph_wl_colors(DIR, rounds=WL_ROUNDS).to_pandas()
    rw = time.time() - t0
    t0 = time.time()
    adj2 = defaultdict(list)
    for tgt in (2 * kk, 2 * kk + 1, kk + 1 + (nc % 64)):
        m = tgt <= nn
        for a, b in zip(kk[m].tolist(), tgt[m].tolist()):
            if b not in adj2[a]:
                adj2[a].append(b)
            if a not in adj2[b]:
                adj2[b].append(a)
    wc = {x: _pmix(len(nb)) & M63 for x, nb in adj2.items()}
    for _ in range(WL_ROUNDS):
        nxt = {}
        for x, nb in adj2.items():
            acc = _pmix(wc[x])
            for c in sorted(wc[y] for y in nb):
                acc = _pmix(acc ^ _pmix(c))
            nxt[x] = acc & M63
        wc = nxt
    dw = time.time() - t0
    gw = dict(zip(got_wl.doc_id.astype(int), got_wl.wl_color.astype(int)))
    assert gw == wc, "wl_refinement MISMATCH vs dict reference"
    ncol = len(set(wc.values()))
    print(f"doc_graph_wl_colors: {len(gw)} nodes, {ncol} distinct colors "
          f"after {WL_ROUNDS} rounds EXACT vs dict WL "
          f"(ray {rw:.1f} s, dict {dw:.1f} s)")

    # ---- grouped OLS2 / KM survival / decile calibration at 10M ----
    for name in ("event_value_ols2", "user_survival_km",
                 "value_decile_calibration", "event_type_top_values",
                 "events_quantile_normalize"):
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
            assert (a == b).all(), (name, c)
        print(f"{name}: {len(got)} rows EXACT at {N} events "
              f"(ray {rw:.1f} s, duckdb {dw:.1f} s)")

    # ---- Q2 at 2M parts vs DuckDB ----
    name = "tpch_q2_min_cost_supplier"
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
        assert (a == b).all(), (name, c)
    print(f"tpch_q2_min_cost_supplier: {len(got)} rows over {N_PART} parts "
          f"x {N_SUPP} suppliers EXACT (ray {rw:.1f} s, duckdb {dw:.1f} s)")

    ray.shutdown()


if __name__ == "__main__":
    main()

"""Correctness-at-volume for the session-15 operators: 1M-document
deterministic graph (BFS levels via 20 BSP rounds + triangle counting
over ~3M edges), 10M synthetic events (run-length encoding, exact-int
z-score screen), 2.5M orders (MoM growth, cohort matrix) and 10M
lineitems (Q12 shipping-lag buckets, Q20-style major-supplier screen) —
each run distributed (32 CPUs) and cross-checked EXACTLY against DuckDB
SQL over the same parquet (the BFS oracle is WITH RECURSIVE at 1M
nodes).  Valid in any host window (exactness, not wall time, is the
claim); walls are printed for the record.

Usage: python BENCH/session15_volume.py [n_events]
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
N_ORD = N // 4
N_USER = 200_000
N_SUPP = 10_000
N_PART = 500_000
DIR = "/tmp/s15_volume"

GOLD = np.uint64(0x9E3779B97F4A7C15)
MASK63 = np.uint64((1 << 63) - 1)
E_TYPES = ["click", "view", "purchase", "signup", "refund", "share",
           "login", "logout"]


def _h(i: np.ndarray, salt: int) -> np.ndarray:
    # splitmix64 finalizer (see session14_volume.py: a bare Weyl sequence
    # is too equidistributed to form the tails these operators select)
    z = (i + np.uint64(salt)) * GOLD
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return (z ^ (z >> np.uint64(31))) & MASK63


def gen():
    os.makedirs(DIR, exist_ok=True)
    if os.path.exists(f"{DIR}/lineitem.parquet"):
        return
    base = np.int64(789_000_000_000_000)
    span = np.uint64(200_000_000_000_000)
    B = 1_000_000

    # documents (doc_id MUST be dense 0..N_DOC-1 for the graph builder)
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
                [E_TYPES[int(v)] for v in (h >> np.uint64(5)) % 8],
                type=pa.string()),
            "value": pa.array(
                ((h >> np.uint64(29)) % 10_000).astype(np.float64) / 100.0
                # ~1/4096 planted spikes so the z-score screen has a
                # real tail to select (uniform data has no |z|>3 rows)
                + np.where((h >> np.uint64(45)) % 4096 == 0, 5000.0, 0.0)),
        })
        if writer is None:
            writer = pq.ParquetWriter(f"{DIR}/events.parquet", t.schema)
        writer.write_table(t)
    writer.close()

    writer = None
    for lo in range(0, N_ORD, B):
        i = np.arange(lo, min(lo + B, N_ORD), dtype=np.uint64)
        h = _h(i, 4)
        t = pa.table({
            "o_orderkey": pa.array(i.astype(np.int64)),
            "o_custkey": pa.array(
                ((h >> np.uint64(3)) % np.uint64(N_USER)).astype(np.int64)),
            "o_totalprice": pa.array(
                ((h >> np.uint64(11)) % 50_000_000).astype(np.float64)
                / 100.0 + 1000.0),
            "o_orderdate": pa.array(
                base + ((h >> np.uint64(13)) % span).astype(np.int64)
            ).cast(pa.timestamp("us")),
            "o_orderpriority": pa.array(
                [f"{int(v)}-{'URGENT' if v == 1 else 'HIGH' if v == 2 else 'PRIO'}"
                 for v in (h >> np.uint64(33)) % 5 + 1],
                type=pa.string()),
        })
        if writer is None:
            writer = pq.ParquetWriter(f"{DIR}/orders.parquet", t.schema)
        writer.write_table(t)
    writer.close()

    i = np.arange(N_SUPP, dtype=np.uint64)
    pq.write_table(pa.table({
        "s_suppkey": pa.array(i.astype(np.int64)),
        "s_name": pa.array([f"Supplier#{int(v):09d}" for v in i],
                           type=pa.string()),
    }), f"{DIR}/supplier.parquet")

    writer = None
    for lo in range(0, N, B):
        i = np.arange(lo, min(lo + B, N), dtype=np.uint64)
        h = _h(i, 5)
        okey = (h >> np.uint64(3)) % np.uint64(N_ORD)
        # ship 0-10 weeks after the PARENT order's date (recomputed from
        # its hash) so the Q12 lag buckets 0..8 all populate
        odate = base + ((_h(okey, 4) >> np.uint64(13)) % span).astype(np.int64)
        lag_us = ((h >> np.uint64(39)) % np.uint64(70))\
            .astype(np.int64) * 86_400_000_000
        t = pa.table({
            "l_orderkey": pa.array(okey.astype(np.int64)),
            "l_partkey": pa.array((h % np.uint64(N_PART)).astype(np.int64)),
            "l_suppkey": pa.array(
                ((h >> np.uint64(7)) % np.uint64(N_SUPP)).astype(np.int64)),
            "l_quantity": pa.array(
                ((h >> np.uint64(13)) % 50 + 1).astype(np.float64)),
            "l_shipdate": pa.array(odate + lag_us).cast(pa.timestamp("us")),
        })
        if writer is None:
            writer = pq.ParquetWriter(f"{DIR}/lineitem.parquet", t.schema)
        writer.write_table(t)
    writer.close()


def main():
    import duckdb
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
    for t in ("documents", "events", "orders", "lineitem", "supplier"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{DIR}/{t}.parquet'")
    names = [
        "doc_graph_triangles",
        "doc_graph_bfs_levels",
        "user_type_runs",
        "event_value_zscore",
        "orders_mom_growth",
        "customer_cohort_orders",
        "tpch_q12_shipping_lag",
        "part_major_suppliers",
    ]
    for name in names:
        t0 = time.time()
        import pandas as pd

        res = qs[name](DIR)
        if isinstance(res, pd.DataFrame):
            got = res
        else:
            got = res.to_pandas()
            if len(got) == 0:
                # zero-row Dataset.to_pandas() loses its columns
                got = pd.DataFrame(
                    {f: pd.Series(dtype="object")
                     for f in res.schema().names}
                )
        rw = time.time() - t0
        t0 = time.time()
        want = con.sql(sql[name]).df()
        dw = time.time() - t0
        cols = sorted(got.columns)
        assert cols == sorted(want.columns), (name, cols, sorted(want.columns))
        got = got[cols].sort_values(cols).reset_index(drop=True)
        want = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(got) == len(want), (name, len(got), len(want))
        for c in cols:
            a, b = got[c].to_numpy(), want[c].to_numpy()
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                ok = (
                    (a.astype(np.float64) == b.astype(np.float64))
                    | (np.isnan(a.astype(np.float64))
                       & np.isnan(b.astype(np.float64)))
                ).all()
                assert ok, (name, c, "float mismatch")
            else:
                assert (a.astype(str) == b.astype(str)).all(), (name, c)
        print(f"{name}: {len(got)} rows EXACT "
              f"(ray {rw:.1f}s, duckdb {dw:.1f}s)", flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()

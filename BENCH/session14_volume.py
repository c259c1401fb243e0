"""Correctness-at-volume for the session-14 operators: 10M synthetic
lineitems (2.5M orders, 500k parts, 10k suppliers, 200k customers) ->
tpch_q18/q16/q22/q9/q11 + orders_totalprice_recon + orders_benford run
distributed (32 CPUs), each cross-checked EXACTLY against DuckDB SQL
over the same parquet.  Valid in any host window (exactness, not wall
time, is the claim); walls are printed for the record.

Usage: python BENCH/session14_volume.py [n_lineitems]
"""

import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
N_ORD = N // 4
N_PART = 500_000
N_SUPP = 10_000
N_CUST = 200_000
DIR = "/tmp/s14_volume"

GOLD = np.uint64(0x9E3779B97F4A7C15)
MASK63 = np.uint64((1 << 63) - 1)

P_NAMES = ["cold widget", "small bolt", "large bolt", "red gear",
           "blue spring", "green bolt", "heavy plate", "light rivet"]
P_BRANDS = [f"Brand#{i}" for i in range(25)]
P_TYPES = ["ECONOMY", "PROMO", "STANDARD", "LARGE", "SMALL", "MEDIUM"]
STATUSES = np.asarray(["F", "O", "P"], dtype=object)


def _h(i: np.ndarray, salt: int) -> np.ndarray:
    # splitmix64 finalizer: a bare Weyl sequence ((i+s)*GOLD) is too
    # equidistributed — every order would get EXACTLY N/N_ORD lines and
    # the heavy tails the q18/q22 operators select for never form
    z = (i + np.uint64(salt)) * GOLD
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return (z ^ (z >> np.uint64(31))) & MASK63


def gen():
    os.makedirs(DIR, exist_ok=True)
    if os.path.exists(f"{DIR}/lineitem.parquet"):
        return
    # dimensions -----------------------------------------------------
    i = np.arange(N_PART, dtype=np.uint64)
    h = _h(i, 1)
    pq.write_table(pa.table({
        "p_partkey": pa.array(i.astype(np.int64)),
        "p_name": pa.array([P_NAMES[int(v)] for v in h % 8],
                           type=pa.string()),
        "p_brand": pa.array([P_BRANDS[int(v)] for v in (h >> np.uint64(5)) % 25],
                            type=pa.string()),
        "p_type": pa.array([P_TYPES[int(v)] for v in (h >> np.uint64(11)) % 6],
                           type=pa.string()),
        "p_size": pa.array(((h >> np.uint64(17)) % 50 + 1).astype(np.int32)),
        "p_retailprice": pa.array(
            ((h >> np.uint64(23)) % 200_000).astype(np.float64) / 100.0 + 900.0),
    }), f"{DIR}/part.parquet")

    i = np.arange(N_SUPP, dtype=np.uint64)
    h = _h(i, 2)
    pq.write_table(pa.table({
        "s_suppkey": pa.array(i.astype(np.int64)),
        "s_name": pa.array([f"Supplier#{int(v):09d}" for v in i],
                           type=pa.string()),
        "s_nationkey": pa.array((h % 25).astype(np.int32)),
        "s_acctbal": pa.array((h % 1_000_000).astype(np.float64) / 100.0),
    }), f"{DIR}/supplier.parquet")

    i = np.arange(25, dtype=np.int64)
    pq.write_table(pa.table({
        "n_nationkey": pa.array(i.astype(np.int32)),
        "n_name": pa.array([f"NATION_{v}" for v in i], type=pa.string()),
        "n_regionkey": pa.array((i % 5).astype(np.int32)),
    }), f"{DIR}/nation.parquet")
    pq.write_table(pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(["ASIA", "EUROPE", "AFRICA", "AMERICA", "OCEANIA"],
                           type=pa.string()),
    }), f"{DIR}/region.parquet")

    i = np.arange(N_CUST, dtype=np.uint64)
    h = _h(i, 3)
    pq.write_table(pa.table({
        "c_custkey": pa.array(i.astype(np.int64)),
        "c_name": pa.array([f"Customer#{int(v):09d}" for v in i],
                           type=pa.string()),
        "c_nationkey": pa.array((h % 25).astype(np.int32)),
        "c_acctbal": pa.array(
            ((h >> np.uint64(9)) % 1_100_000).astype(np.float64) / 100.0
            - 1000.0),
        "c_mktsegment": pa.array(
            [f"SEG_{int(v)}" for v in (h >> np.uint64(29)) % 5],
            type=pa.string()),
    }), f"{DIR}/customer.parquet")

    # facts ----------------------------------------------------------
    base = np.int64(789_000_000_000_000)  # ~1995 in us
    span = np.uint64(200_000_000_000_000)  # ~6.3 years of us
    B = 1_000_000
    writer = None
    for lo in range(0, N_ORD, B):
        i = np.arange(lo, min(lo + B, N_ORD), dtype=np.uint64)
        h = _h(i, 4)
        t = pa.table({
            "o_orderkey": pa.array(i.astype(np.int64)),
            "o_custkey": pa.array((h % np.uint64(N_CUST)).astype(np.int64)),
            "o_orderstatus": pa.array(
                STATUSES[(h >> np.uint64(5)).astype(np.int64) % 3],
                type=pa.string()),
            "o_totalprice": pa.array(
                ((h >> np.uint64(11)) % 50_000_000).astype(np.float64)
                / 100.0 + 1000.0),
            "o_orderdate": pa.array(
                base + ((h >> np.uint64(13)) % span).astype(np.int64)
            ).cast(pa.timestamp("us")),
            "o_orderpriority": pa.array(
                [f"{int(v)}-PRIO" for v in (h >> np.uint64(33)) % 5],
                type=pa.string()),
        })
        if writer is None:
            writer = pq.ParquetWriter(f"{DIR}/orders.parquet", t.schema)
        writer.write_table(t)
    writer.close()

    writer = None
    for lo in range(0, N, B):
        i = np.arange(lo, min(lo + B, N), dtype=np.uint64)
        h = _h(i, 5)
        t = pa.table({
            "l_orderkey": pa.array(
                ((h >> np.uint64(3)) % np.uint64(N_ORD)).astype(np.int64)),
            "l_partkey": pa.array((h % np.uint64(N_PART)).astype(np.int64)),
            "l_suppkey": pa.array(
                ((h >> np.uint64(7)) % np.uint64(N_SUPP)).astype(np.int64)),
            "l_linenumber": pa.array((i % 7 + 1).astype(np.int32)),
            "l_quantity": pa.array(
                ((h >> np.uint64(13)) % 50 + 1).astype(np.float64)),
            "l_extendedprice": pa.array(
                ((h >> np.uint64(19)) % 10_000_000).astype(np.float64)
                / 100.0 + 100.0),
            "l_discount": pa.array(
                ((h >> np.uint64(29)) % 11).astype(np.float64) / 100.0),
            "l_tax": pa.array(
                ((h >> np.uint64(33)) % 9).astype(np.float64) / 100.0),
            "l_returnflag": pa.array(
                ["R" if v else "N" for v in (h >> np.uint64(37)) % 2],
                type=pa.string()),
            "l_linestatus": pa.array(
                ["F" if v else "O" for v in (h >> np.uint64(38)) % 2],
                type=pa.string()),
            "l_shipdate": pa.array(
                base + ((h >> np.uint64(39)) % span).astype(np.int64)
            ).cast(pa.timestamp("us")),
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
    for t in ("lineitem", "orders", "part", "supplier", "nation",
              "region", "customer"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{DIR}/{t}.parquet'")
    names = [
        "orders_benford",
        "tpch_q11_important_parts",
        "tpch_q18_large_orders",
        "tpch_q9_product_profit",
        "tpch_q22_dormant_customers",
        "orders_totalprice_recon",
        "tpch_q16_supplier_counts",
    ]
    for name in names:
        t0 = time.time()
        got = qs[name](DIR).to_pandas()
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
              f"(ray {rw:.1f}s, duckdb {dw:.1f}s)")
    ray.shutdown()


if __name__ == "__main__":
    main()

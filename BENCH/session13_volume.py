"""Correctness-at-volume for the session-13 operators: 10M synthetic
events -> user_out_of_order_events / user_longest_streak /
user_interevent_median / events_daily_autocorr / event_value_deciles /
events_anomaly_hours run distributed (32 CPUs), each cross-checked
EXACTLY against DuckDB SQL over the same parquet.  Valid in any host
window (exactness, not wall time, is the claim); walls are printed for
the record.

Usage: python BENCH/session13_volume.py [n_rows] [n_users]
"""

import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
U = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
DIR = "/tmp/s13_volume"
PATH = f"{DIR}/events.parquet"
TYPES = np.asarray(["click", "view", "purchase", "error", "signup"], dtype=object)


def gen():
    os.makedirs(DIR, exist_ok=True)
    if os.path.exists(PATH):
        return
    writer = None
    B = 1_000_000
    for lo in range(0, N, B):
        i = np.arange(lo, min(lo + B, N), dtype=np.uint64)
        h = (i * np.uint64(0x9E3779B97F4A7C15)) & np.uint64((1 << 63) - 1)
        user = (h % np.uint64(U)).astype(np.int64)
        # 60 days of microseconds from a fixed epoch base
        base = np.int64(1_700_000_000_000_000)
        ts = base + (
            (h >> np.uint64(17)) % np.uint64(5_184_000_000_000)
        ).astype(np.int64)
        et = TYPES[(h >> np.uint64(7)).astype(np.int64) % 5]
        cents = ((h >> np.uint64(23)) % np.uint64(10_000_000)).astype(np.int64)
        t = pa.table(
            {
                "event_id": pa.array(i.astype(np.int64)),
                "ts": pa.array(ts).cast(pa.timestamp("us")),
                "user_id": pa.array(user),
                "event_type": pa.array(et, type=pa.string()),
                "value": pa.array(cents.astype(np.float64) / 100.0),
                "props": pa.array(np.full(i.shape[0], "{}", dtype=object),
                                  type=pa.string()),
            }
        )
        if writer is None:
            writer = pq.ParquetWriter(PATH, t.schema)
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
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{PATH}'")

    names = [
        "user_out_of_order_events",
        "user_longest_streak",
        "user_interevent_median",
        "events_daily_autocorr",
        "event_value_deciles",
        "events_anomaly_hours",
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

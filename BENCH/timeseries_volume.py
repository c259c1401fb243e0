"""Correctness-at-volume for the time-series family: 10M synthetic
events -> interval_union / transition_counts / retention_cohorts run
distributed (32 CPUs), each cross-checked BIT-EXACT against DuckDB
window SQL over the same parquet.  Valid in any host window (exactness,
not wall time, is the claim); walls are printed for the record.

Usage: python BENCH/timeseries_volume.py [n_rows] [n_users]
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
PATH = "/tmp/ts_volume/events.parquet"
TYPES = np.asarray(["click", "view", "purchase", "error", "signup"], dtype=object)


def gen():
    """Deterministic events: Lehmer-ish mix of the row index."""
    os.makedirs(os.path.dirname(PATH), exist_ok=True)
    if os.path.exists(PATH):
        return
    writer = None
    B = 1_000_000
    for lo in range(0, N, B):
        i = np.arange(lo, min(lo + B, N), dtype=np.uint64)
        h = (i * np.uint64(0x9E3779B97F4A7C15)) & np.uint64((1 << 63) - 1)
        user = (h % np.uint64(U)).astype(np.int64)
        # 30 days of microseconds
        ts = ((h >> np.uint64(17)) % np.uint64(2_592_000_000_000)).astype(np.int64)
        et = TYPES[(h >> np.uint64(7)).astype(np.int64) % 5]
        t = pa.table(
            {
                "event_id": pa.array(i.astype(np.int64)),
                "user_id": pa.array(user),
                "ts": pa.array(ts).cast(pa.timestamp("us")),
                "event_type": pa.array(et, type=pa.string()),
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
    import ray.data

    from libpostal_ray.pipelines.timeseries import (
        interval_union,
        retention_cohorts,
        transition_counts,
    )

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{PATH}'")
    results = {}

    def check(name, ray_df, sql, keys):
        t0 = time.time()
        want = con.sql(sql).df().sort_values(keys).reset_index(drop=True)
        d_wall = time.time() - t0
        got = ray_df.sort_values(keys).reset_index(drop=True)
        got = got[want.columns.tolist()]
        assert len(got) == len(want), (name, len(got), len(want))
        for c in want.columns:
            a = got[c].to_numpy()
            b = want[c].to_numpy()
            if a.dtype.kind in "iu" or b.dtype.kind in "iu":
                assert (a.astype(np.int64) == b.astype(np.int64)).all(), (name, c)
            else:
                assert (a.astype(str) == b.astype(str)).all(), (name, c)
        results[name] = {"rows": len(got), "duckdb_s": round(d_wall, 2)}
        print(f"{name}: {len(got)} rows EXACT (duckdb {d_wall:.1f}s)")

    t0 = time.time()
    iu = interval_union(
        ray.data.read_parquet(PATH, columns=["user_id", "ts"]),
        "user_id", "ts", span_us=300_000_000,
    ).to_pandas().rename(columns={"key": "user_id"})
    w = time.time() - t0
    print(f"interval_union ray wall {w:.1f}s")
    results["interval_union_ray_s"] = round(w, 2)
    check(
        "interval_union", iu,
        """WITH iv AS (SELECT user_id, epoch_us(ts) s, epoch_us(ts)+300000000 e FROM events),
           m AS (SELECT user_id, s, e, CASE WHEN s <= max(e) OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) THEN 0 ELSE 1 END ng FROM iv),
           g AS (SELECT user_id, s, e, SUM(ng) OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS UNBOUNDED PRECEDING) grp FROM m),
           sp AS (SELECT user_id, grp, max(e)-min(s) span FROM g GROUP BY user_id, grp)
           SELECT user_id, count(*) n_busy, CAST(sum(span) AS BIGINT) busy_us
           FROM sp GROUP BY user_id""",
        ["user_id"],
    )

    t0 = time.time()
    tr = transition_counts(
        ray.data.read_parquet(PATH), "user_id", "ts", "event_type", "event_id"
    ).to_pandas().rename(
        columns={"prev_label": "prev_type", "next_label": "next_type"}
    )
    w = time.time() - t0
    print(f"transition_counts ray wall {w:.1f}s")
    results["transition_counts_ray_s"] = round(w, 2)
    check(
        "transition_counts", tr,
        """WITH s AS (SELECT user_id, event_type, lag(event_type) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) prev_type FROM events)
           SELECT prev_type, event_type next_type, count(*) n FROM s
           WHERE prev_type IS NOT NULL GROUP BY 1, 2""",
        ["prev_type", "next_type"],
    )

    t0 = time.time()
    rc = retention_cohorts(
        ray.data.read_parquet(PATH, columns=["user_id", "ts"]),
        "user_id", "ts", bucket_us=86_400_000_000,
    ).to_pandas()
    w = time.time() - t0
    print(f"retention_cohorts ray wall {w:.1f}s")
    results["retention_cohorts_ray_s"] = round(w, 2)
    check(
        "retention_cohorts", rc,
        """WITH a AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 active_bucket FROM events),
           f AS (SELECT user_id, min(active_bucket) cohort_bucket FROM a GROUP BY user_id)
           SELECT cohort_bucket, active_bucket, count(*) n_keys FROM a JOIN f USING (user_id)
           GROUP BY 1, 2""",
        ["cohort_bucket", "active_bucket"],
    )

    print("ALL EXACT", results)
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Round-4 session-15 operators: window-over-aggregate (MoM growth),
order cohort matrix, Q20/Q12 analogs, event-type run-length encoding and
the exact-integer z-score screen.  DuckDB value parity lives in
test_oracle_parity.py; these tests pin semantics and edge cases."""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

US = 1_000_000
DAY_US = 86_400_000_000


def _ts(day_idx, us=0):
    return day_idx * DAY_US + us


def _write(tmp_path, name, table):
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(table, str(d / f"{name}.parquet"))
    return str(d)


class TestOrdersMomGrowth:
    def test_lag_semantics(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import orders_mom_growth

        orders = pa.table(
            {
                "o_orderdate": pa.array(
                    [
                        np.datetime64("2024-01-05", "us"),
                        np.datetime64("2024-01-20", "us"),
                        np.datetime64("2024-03-02", "us"),
                    ]
                ),
                "o_totalprice": pa.array([10.0, 20.5, 7.25]),
            }
        )
        d = _write(tmp_path, "orders", orders)
        out = orders_mom_growth(d).to_pandas().sort_values("ym")
        # the earliest month has no predecessor and is dropped (null-free
        # output); March lags January (previous EXISTING month, not
        # calendar-previous) — SQL lag() + QUALIFY semantics
        assert list(out["ym"]) == [202403]
        assert list(out["revenue_cents"]) == [725]
        assert out["prev_revenue_cents"].iloc[0] == 3050
        assert out["delta_cents"].iloc[0] == 725 - 3050

    def test_matches_plain_rollup(self, ray_session):
        from libpostal_ray.pipelines.queries import orders_by_month, orders_mom_growth

        a = orders_by_month(SF).to_pandas()
        a["ym"] = a["year"] * 100 + a["month"]
        b = orders_mom_growth(SF).to_pandas()
        merged = a.merge(b, on="ym")
        assert (merged["price_cents"] == merged["revenue_cents"]).all()


class TestCustomerCohortOrders:
    def test_planted_cohorts(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import customer_cohort_orders

        # cust 1: Jan + Feb; cust 2: Feb only; cust 3: Jan twice (dedup)
        orders = pa.table(
            {
                "o_custkey": pa.array([1, 1, 2, 3, 3], type=pa.int64()),
                "o_orderdate": pa.array(
                    [
                        np.datetime64("2024-01-05", "us"),
                        np.datetime64("2024-02-01", "us"),
                        np.datetime64("2024-02-10", "us"),
                        np.datetime64("2024-01-07", "us"),
                        np.datetime64("2024-01-30", "us"),
                    ]
                ),
            }
        )
        d = _write(tmp_path, "orders", orders)
        out = customer_cohort_orders(d).to_pandas()
        got = {
            (r["cohort_ym"], r["ym"]): r["n_custs"] for _, r in out.iterrows()
        }
        assert got == {
            (202401, 202401): 2,  # cust 1 and 3
            (202401, 202402): 1,  # cust 1 retained
            (202402, 202402): 1,  # cust 2's cohort
        }

    def test_diagonal_counts_all_customers(self, ray_session):
        from libpostal_ray.pipelines.queries import customer_cohort_orders

        out = customer_cohort_orders(SF).to_pandas()
        diag = out[out["cohort_ym"] == out["ym"]]["n_custs"].sum()
        import duckdb

        n = duckdb.sql(
            f"SELECT count(DISTINCT o_custkey) FROM '{SF}/orders.parquet'"
        ).fetchone()[0]
        assert diag == n


class TestPartMajorSuppliers:
    def test_planted_share(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import part_major_suppliers

        # part 10: supplier 1 ships 60 of 100 (major at mult=8 AND 2);
        # suppliers 2..5 ship 10 each (10% — NOT major at mult=8)
        line = pa.table(
            {
                "l_partkey": pa.array([10] * 5, type=pa.int64()),
                "l_suppkey": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                "l_quantity": pa.array([60.0, 10.0, 10.0, 10.0, 10.0]),
            }
        )
        supp = pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                "s_name": pa.array([f"S{i}" for i in range(1, 6)]),
            }
        )
        d = _write(tmp_path, "lineitem", line)
        _write(tmp_path, "supplier", supp)
        out = part_major_suppliers(d).to_pandas()
        assert set(out["s_suppkey"]) == {1}
        assert out["s_name"].iloc[0] == "S1"
        assert out["n_major_parts"].iloc[0] == 1
        strict = part_major_suppliers(d, mult=2).to_pandas()
        assert set(strict["s_suppkey"]) == {1}


class TestQ12ShippingLag:
    def test_buckets_and_clamps(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import tpch_q12_shipping_lag

        base = np.datetime64("2024-01-01", "us").astype("datetime64[us]")

        def day(n):
            return base + np.timedelta64(n * 86_400_000_000, "us")

        orders = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3, 4], type=pa.int64()),
                "o_orderdate": pa.array([day(0), day(0), day(0), day(0)]),
                "o_orderpriority": pa.array(
                    ["1-URGENT", "3-MEDIUM", "2-HIGH", "5-LOW"]
                ),
            }
        )
        # order 1: first ship day 3 (week 0); order 2: day 10 (week 1);
        # order 3: ship BEFORE order (clamps to 0); order 4: day 100
        # (week 14 -> capped to 8).  Order 1 has a later second line that
        # must not win the min.
        line = pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2, 3, 4], type=pa.int64()),
                "l_shipdate": pa.array(
                    [day(3), day(40), day(10), day(-5), day(100)]
                ),
            }
        )
        d = _write(tmp_path, "orders", orders)
        _write(tmp_path, "lineitem", line)
        out = tpch_q12_shipping_lag(d).to_pandas()
        got = {
            r["lag_weeks"]: (r["high_n"], r["low_n"])
            for _, r in out.iterrows()
        }
        assert got == {0: (2, 0), 1: (0, 1), 8: (0, 1)}


class TestUserTypeRuns:
    def test_planted_runs(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import user_type_runs

        # user 1 sequence: A A B A  -> A: runs [2,1] (longest 2, n=2),
        #                              B: runs [1]
        # tie on ts between rows 2 and 3 broken by event_id
        ev = pa.table(
            {
                "user_id": pa.array([1, 1, 1, 1], type=pa.int64()),
                "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "ts": pa.array(
                    [_ts(0), _ts(0, 5), _ts(0, 5), _ts(1)], type=pa.int64()
                ).cast(pa.timestamp("us")),
                "event_type": pa.array(["A", "A", "B", "A"]),
            }
        )
        d = _write(tmp_path, "events", ev)
        out = user_type_runs(d).to_pandas()
        got = {
            (r["user_id"], r["event_type"]): (r["longest_run"], r["n_runs"])
            for _, r in out.iterrows()
        }
        assert got == {(1, "A"): (2, 2), (1, "B"): (1, 1)}

    def test_total_runs_bounded(self, ray_session):
        from libpostal_ray.pipelines.queries import user_type_runs

        out = user_type_runs(SF).to_pandas()
        assert (out["longest_run"] >= 1).all()
        assert (out["n_runs"] >= 1).all()


class TestEventValueZscore:
    def test_planted_outlier(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import event_value_zscore

        vals = [10.0] * 20 + [10.01] * 20 + [9.99] * 20 + [500.0]
        n = len(vals)
        ev = pa.table(
            {
                "event_id": pa.array(range(n), type=pa.int64()),
                "event_type": pa.array(["buy"] * n),
                "value": pa.array(vals),
            }
        )
        d = _write(tmp_path, "events", ev)
        out = event_value_zscore(d).to_pandas()
        assert list(out["event_id"]) == [n - 1]
        assert out["value_cents"].iloc[0] == 50000

    def test_identity_vs_float_zscore(self, ray_session):
        """The integer identity must agree with the plain float z-score
        on real data (no boundary rows at 3 sigma exactly)."""
        from libpostal_ray.pipelines.queries import event_value_zscore

        out = event_value_zscore(SF).to_pandas()
        ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
        ev["c"] = np.floor(ev["value"] * 100).astype(np.int64)
        expect = set()
        for tp, g in ev.groupby("event_type"):
            c = g["c"].to_numpy()
            mu, sd = c.mean(), c.std()
            z = np.abs((c - mu) / sd)
            expect |= set(g["event_id"].to_numpy()[z > 3.0000001])
        got = set(out["event_id"])
        # the float check can disagree only within float noise of the
        # boundary; require symmetric difference to be tiny
        assert len(got ^ expect) <= max(1, len(got) // 50)


def test_session15_queries_on_empty_corpus(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    d = tmp_path / "sf_empty"
    d.mkdir()
    for t in (
        "events", "lineitem", "orders", "customer", "documents",
        "nation", "part", "supplier", "region",
    ):
        schema = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    qs = entrymod.queries()
    for name in (
        "orders_mom_growth",
        "customer_cohort_orders",
        "part_major_suppliers",
        "tpch_q12_shipping_lag",
        "user_type_runs",
        "event_value_zscore",
    ):
        res = qs[name](str(d))
        df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
        assert len(df) == 0, (name, df.head())


class TestDocGraph:
    """Planted 6-node graph: k=1..6, tree edges 1-2,1-3,2-4,2-5,3-6 plus
    skip edges chosen via n_chars: (2,3),(3,5),(4,5),(5,6).  Triangles:
    (1,2,3),(2,3,5),(2,4,5),(3,5,6) = 4; degrees 2,4,4,2,4,2 -> 21
    wedges; BFS levels 0,1,1,2,2,2."""

    def _docs(self, tmp_path):
        # n_chars % 64 picks the skip target k + 1 + (n_chars % 64)
        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4, 5], type=pa.int64()),
                "n_chars": pa.array([64, 64, 1, 128, 64, 5], type=pa.int64()),
            }
        )
        return _write(tmp_path, "documents", docs)

    def test_bfs_levels(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import doc_graph_bfs_levels

        out = doc_graph_bfs_levels(self._docs(tmp_path)).sort_values("doc_id")
        assert list(out["doc_id"]) == [0, 1, 2, 3, 4, 5]
        assert list(out["level"]) == [0, 1, 1, 2, 2, 2]

    def test_triangles_and_wedges(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import doc_graph_triangles

        out = doc_graph_triangles(self._docs(tmp_path))
        assert out["n_triangles"].iloc[0] == 4
        assert out["n_wedges"].iloc[0] == 21

    def test_empty_corpus(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import (
            doc_graph_bfs_levels,
            doc_graph_triangles,
        )

        docs = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_chars": pa.array([], type=pa.int64()),
            }
        )
        d = _write(tmp_path, "documents", docs)
        assert len(doc_graph_bfs_levels(d)) == 0
        t = doc_graph_triangles(d)
        assert t["n_triangles"].iloc[0] == 0 and t["n_wedges"].iloc[0] == 0


class TestSortedNeighborhood:
    def test_planted_window(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import sorted_neighborhood_pairs

        # sort order by 16-byte prefix: doc 3 ("aaa..."), 0 ("abc"),
        # 2 ("abd"), 1 ("zzz") -> ranks 0..3
        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                "text": pa.array(["abc x", "zzz y", "abd z", "aaa w"]),
            }
        )
        d = _write(tmp_path, "documents", docs)
        out = sorted_neighborhood_pairs(d, w=2).to_pandas()
        got = {
            (r["doc_id_a"], r["doc_id_b"], r["dist"])
            for _, r in out.iterrows()
        }
        assert got == {
            (3, 0, 1), (0, 2, 1), (2, 1, 1),   # adjacent
            (3, 2, 2), (0, 1, 2),              # distance 2
        }

    def test_pair_count_identity(self, ray_session):
        from libpostal_ray.pipelines.queries import sorted_neighborhood_pairs

        # n ranks, window w: exactly sum_{d=1..w} (n - d) pairs
        out = sorted_neighborhood_pairs(SF, w=3).to_pandas()
        import duckdb

        n = duckdb.sql(
            f"SELECT count(*) FROM '{SF}/documents.parquet'"
        ).fetchone()[0]
        assert len(out) == sum(n - d for d in range(1, 4))
        assert (out.groupby("dist").size() == [n - 1, n - 2, n - 3]).all()

    def test_empty_and_tiny(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import sorted_neighborhood_pairs

        docs = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
            }
        )
        d = _write(tmp_path, "documents", docs)
        assert sorted_neighborhood_pairs(d).to_pandas().shape[0] == 0

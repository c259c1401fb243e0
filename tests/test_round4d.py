"""Round-4 session-13 operators: TPC-H Q13/Q4 analogs, gaps-and-islands
streaks, per-user inter-event medians, exact global deciles — plus the
int-key regression for the grouped exact quantile (its refinement passes
compared stringified group labels against the raw key column, so any
non-string key silently returned radix bucket bounds)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_grouped_exact_quantiles_int_keys(ray_session):
    """INT64 group keys must refine exactly like string keys (the
    label-vs-raw-column comparison bug returned bucket lower bounds)."""
    import ray

    from libpostal_ray.functions.quantile import grouped_exact_quantiles_cont

    rng = np.random.default_rng(13)
    n = 4000
    grp = rng.integers(0, 5, n).astype(np.int64)
    val = np.floor(rng.normal(size=n) * 1e4)  # signed integral doubles
    t = pa.table({"k": pa.array(grp), "v": pa.array(val)})
    ds = ray.data.from_arrow(t).repartition(7)
    out = grouped_exact_quantiles_cont(ds, "k", "v", [0.1, 0.9])
    got = {
        (g, q): v
        for g, q, v in zip(
            out["k"].to_pylist(), out["q"].to_pylist(),
            out["q_value"].to_pylist(),
        )
    }
    for g in np.unique(grp):
        s = np.sort(val[grp == g])
        m = s.shape[0]
        for q in (0.1, 0.9):
            h = q * (m - 1)
            lo = int(np.floor(h))
            hi = min(lo + 1, m - 1)
            ref = float(s[lo] + (h - lo) * (s[hi] - s[lo]))
            assert got[(str(g), q)] == ref, (g, q, got[(str(g), q)], ref)


class TestCustdist:
    def test_zero_order_customers_counted(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import tpch_q13_custdist

        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.table({"c_custkey": pa.array([1, 2, 3, 4], type=pa.int64())}),
            str(d / "customer.parquet"),
        )
        # cust 1 -> 3 orders, cust 2 -> 1, cust 3/4 -> 0
        pq.write_table(
            pa.table(
                {"o_custkey": pa.array([1, 1, 1, 2], type=pa.int64())}
            ),
            str(d / "orders.parquet"),
        )
        out = tpch_q13_custdist(str(d)).to_pandas()
        got = dict(zip(out["c_count"], out["custdist"]))
        assert got == {0: 2, 1: 1, 3: 1}
        # sorted by custdist desc then c_count desc
        assert out["custdist"].tolist() == sorted(
            out["custdist"].tolist(), reverse=True
        ) or out.iloc[0]["custdist"] >= out.iloc[-1]["custdist"]


class TestLateShipments:
    def test_exists_semantics(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import tpch_q4_late_shipments

        d = tmp_path / "sf"
        d.mkdir()
        t0 = np.datetime64("1996-03-01T00:00:00", "us")
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
                    "o_orderdate": pa.array([t0, t0, t0], type=pa.timestamp("us")),
                    "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "5-LOW"]),
                }
            ),
            str(d / "orders.parquet"),
        )
        # order 1: one late line (+50d); order 2: on-time only (+10d);
        # order 3: two lines, one late (+46d)
        day = np.timedelta64(1, "D")
        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array([1, 2, 3, 3], type=pa.int64()),
                    "l_shipdate": pa.array(
                        [t0 + 50 * day, t0 + 10 * day, t0 + 5 * day, t0 + 46 * day],
                        type=pa.timestamp("us"),
                    ),
                }
            ),
            str(d / "lineitem.parquet"),
        )
        out = tpch_q4_late_shipments(str(d)).to_pandas()
        got = dict(zip(out["o_orderpriority"], out["n_orders"]))
        assert got == {"1-URGENT": 1, "5-LOW": 1}


class TestLongestStreak:
    def test_runs_and_gaps(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import user_longest_streak

        d = tmp_path / "sf"
        d.mkdir()
        day = np.timedelta64(1, "D")
        t0 = np.datetime64("2024-01-01T05:00:00", "us")
        # user 1: days 0,1,2, 5,6  -> longest 3
        # user 2: day 0 twice      -> longest 1 (distinct days)
        ts = [t0, t0 + day, t0 + 2 * day, t0 + 5 * day, t0 + 6 * day, t0, t0]
        uid = [1, 1, 1, 1, 1, 2, 2]
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array(uid, type=pa.int64()),
                    "ts": pa.array(ts, type=pa.timestamp("us")),
                }
            ),
            str(d / "events.parquet"),
        )
        out = user_longest_streak(str(d)).to_pandas()
        got = dict(zip(out["user_id"], out["longest_streak"]))
        assert got == {1: 3, 2: 1}


class TestInterEventMedian:
    def test_median_matches_numpy(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import user_interevent_median

        d = tmp_path / "sf"
        d.mkdir()
        rng = np.random.default_rng(7)
        uid = rng.integers(0, 20, 500).astype(np.int64)
        ts = np.datetime64("2024-01-01", "us") + rng.integers(
            0, 10**9, 500
        ).astype("timedelta64[us]")
        eid = np.arange(500, dtype=np.int64)
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array(uid),
                    "ts": pa.array(ts, type=pa.timestamp("us")),
                    "event_id": pa.array(eid),
                }
            ),
            str(d / "events.parquet"),
        )
        out = user_interevent_median(str(d)).to_pandas()
        got = dict(zip(out["user_id"], out["median_gap_us"]))
        ti = ts.astype("datetime64[us]").astype(np.int64)
        for u in np.unique(uid):
            m = uid == u
            if m.sum() < 2:
                assert u not in got
                continue
            order = np.lexsort((eid[m], ti[m]))
            gaps = np.sort(np.diff(ti[m][order]))
            n = gaps.shape[0]
            lo, hi = (n - 1) // 2, n // 2
            ref = (float(gaps[lo]) + float(gaps[hi])) / 2.0
            assert got[u] == ref, (u, got[u], ref)


class TestDeciles:
    def test_bucket_counts_sum_to_n(self, ray_session):
        from libpostal_ray.pipelines.queries import event_value_deciles

        out = event_value_deciles(SF).to_pandas()
        assert out["decile"].tolist() == sorted(out["decile"].tolist())
        assert set(out["decile"]) <= set(range(10))
        assert out["n_events"].sum() == 1000


class TestGini:
    def test_tie_invariance_and_formula(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import segment_acctbal_gini

        d = tmp_path / "sf"
        d.mkdir()
        # seg A: perfectly equal -> gini 0; seg B: one holder -> (n-1)/n
        bal = [10.0, 10.0, 10.0, 10.0, 0.0, 0.0, 0.0, 40.0]
        seg = ["A"] * 4 + ["B"] * 4
        pq.write_table(
            pa.table(
                {
                    "c_mktsegment": pa.array(seg),
                    "c_acctbal": pa.array(bal, type=pa.float64()),
                }
            ),
            str(d / "customer.parquet"),
        )
        out = segment_acctbal_gini(str(d)).to_pandas().set_index("c_mktsegment")
        assert out.loc["A", "gini_num"] == 0
        assert out.loc["A", "gini"] == 0.0
        # B: sorted [0,0,0,4000], ranks 1..4: num = 2*16000 - 5*4000 = 12000
        assert out.loc["B", "gini_num"] == 12000
        assert out.loc["B", "gini_den"] == 16000
        assert out.loc["B", "gini"] == 0.75


class TestRFM:
    def test_quartile_scores(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import customer_rfm

        d = tmp_path / "sf"
        d.mkdir()
        day = np.timedelta64(1, "D")
        t0 = np.datetime64("2024-01-01T00:00:00", "us")
        # 8 customers, 1 order each: monotone recency and price so the
        # quartile score must be monotone in custkey
        n = 8
        pq.write_table(
            pa.table(
                {
                    "o_custkey": pa.array(range(1, n + 1), type=pa.int64()),
                    "o_orderdate": pa.array(
                        [t0 + i * day for i in range(n)],
                        type=pa.timestamp("us"),
                    ),
                    "o_totalprice": pa.array(
                        [100.0 * (i + 1) for i in range(n)],
                        type=pa.float64(),
                    ),
                }
            ),
            str(d / "orders.parquet"),
        )
        out = customer_rfm(str(d)).to_pandas().sort_values("c_custkey")
        assert out["r_score"].tolist() == out["m_score"].tolist()
        assert out["r_score"].tolist() == sorted(out["r_score"].tolist())
        assert out["r_score"].min() == 1 and out["r_score"].max() == 4
        # all frequencies equal -> every f_score identical
        assert out["f_score"].nunique() == 1


class TestNearestOrder:
    def test_direction_and_tie_break(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import event_nearest_order

        d = tmp_path / "sf"
        d.mkdir()
        us = np.timedelta64(1, "us")
        t0 = np.datetime64("2024-01-10T00:00:00", "us")
        # user 1 orders at t0-100 (key 11) and t0+100 (key 12):
        #   event at t0      -> TIE -> earlier order 11, gap 100
        #   event at t0+60   -> succ closer -> 12, gap 40
        #   event at t0-100  -> exact match -> 11, gap 0
        # user 2 has no orders -> its event drops
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([11, 12], type=pa.int64()),
                    "o_custkey": pa.array([1, 1], type=pa.int64()),
                    "o_orderdate": pa.array(
                        [t0 - 100 * us, t0 + 100 * us],
                        type=pa.timestamp("us"),
                    ),
                }
            ),
            str(d / "orders.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                    "user_id": pa.array([1, 1, 1, 2], type=pa.int64()),
                    "ts": pa.array(
                        [t0, t0 + 60 * us, t0 - 100 * us, t0],
                        type=pa.timestamp("us"),
                    ),
                }
            ),
            str(d / "events.parquet"),
        )
        out = (
            event_nearest_order(str(d))
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert out["event_id"].tolist() == [1, 2, 3]
        assert out["o_orderkey"].tolist() == [11, 12, 11]
        assert out["gap_us"].tolist() == [100, 40, 0]


class TestOutOfOrder:
    def test_running_max_semantics(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import user_out_of_order_events

        d = tmp_path / "sf"
        d.mkdir()
        us = np.timedelta64(1, "us")
        t0 = np.datetime64("2024-01-01T00:00:00", "us")
        # user 1 arrival order (event_id): ts 10, 5 (late by 5), 20,
        # 7 (late by 13), 20 (equal to max -> NOT late)
        ts = [t0 + k * us for k in (10, 5, 20, 7, 20)]
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array([1] * 5, type=pa.int64()),
                    "ts": pa.array(ts, type=pa.timestamp("us")),
                    "event_id": pa.array(range(5), type=pa.int64()),
                }
            ),
            str(d / "events.parquet"),
        )
        out = user_out_of_order_events(str(d)).to_pandas()
        assert len(out) == 1
        assert out.loc[0, "n_events"] == 5
        assert out.loc[0, "n_out_of_order"] == 2
        assert out.loc[0, "max_lateness_us"] == 13


class TestAutocorr:
    def test_exact_moments_vs_numpy(self, ray_session):
        from libpostal_ray.pipelines.queries import events_daily_autocorr

        out = events_daily_autocorr(SF).to_pandas()
        assert len(out) == 1
        m = out.loc[0]
        num = m.n_pairs * m.sum_xy - m.sum_x * m.sum_y
        den2 = (m.n_pairs * m.sum_xx - m.sum_x**2) * (
            m.n_pairs * m.sum_yy - m.sum_y**2
        )
        import math

        assert m.r == float(num) / math.sqrt(float(den2))
        assert -1.0 <= m.r <= 1.0


class TestMixtureWeights:
    def test_uniform_target(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import source_mixture_weights

        d = tmp_path / "sf"
        d.mkdir()
        # source a: 6 tokens total, source b: 2 -> total 8, ns 2
        pq.write_table(
            pa.table(
                {
                    "source": pa.array(["a", "a", "b"]),
                    "text": pa.array(["x y z", "p q r", "u v"]),
                }
            ),
            str(d / "documents.parquet"),
        )
        out = source_mixture_weights(str(d)).to_pandas().set_index("source")
        assert out.loc["a", "n_tokens"] == 6
        assert out.loc["b", "n_tokens"] == 2
        assert out.loc["a", "weight"] == 8.0 / 12.0
        assert out.loc["b", "weight"] == 8.0 / 4.0
        # weighted token mass equalizes across sources
        assert (
            out.loc["a", "weight"] * 6 == out.loc["b", "weight"] * 2
        )


class TestDupHistogram:
    def test_planted_copies(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import dup_cluster_histogram

        d = tmp_path / "sf"
        d.mkdir()
        texts = ["unique%d" % i for i in range(5)] + ["copy"] * 3 + ["pair"] * 2
        pq.write_table(
            pa.table({"text": pa.array(texts)}), str(d / "documents.parquet")
        )
        out = dup_cluster_histogram(str(d)).to_pandas()
        got = dict(zip(out["cluster_size"], out["n_clusters"]))
        assert got == {1: 5, 2: 1, 3: 1}


class TestAnomalyHours:
    def test_planted_spike(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import events_anomaly_hours

        d = tmp_path / "sf"
        d.mkdir()
        hr = np.timedelta64(1, "h")
        t0 = np.datetime64("2024-01-01T00:00:00", "us")
        # 20 quiet hours with 10 events each, one spike hour with 100
        ts = []
        for h in range(20):
            ts += [t0 + h * hr] * 10
        ts += [t0 + 30 * hr] * 100
        pq.write_table(
            pa.table(
                {"ts": pa.array(np.array(ts, dtype="datetime64[us]"),
                                type=pa.timestamp("us"))}
            ),
            str(d / "events.parquet"),
        )
        out = events_anomaly_hours(str(d)).to_pandas()
        assert len(out) == 1
        assert out.loc[0, "n_events"] == 100
        assert out.loc[0, "abs_dev"] == 90


class TestFulfillmentLag:
    def test_interpolation_matches_numpy(self, ray_session):
        from libpostal_ray.pipelines.queries import order_fulfillment_lag

        out = order_fulfillment_lag(SF).to_pandas()
        assert len(out) == 5
        assert (out["lag_q1"] <= out["lag_med"]).all()
        assert (out["lag_med"] <= out["lag_q3"]).all()


class TestCheapestSupplier:
    def test_argmin_tie_break(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import part_cheapest_supplier

        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "l_partkey": pa.array([1, 1, 1, 2], type=pa.int64()),
                    "l_suppkey": pa.array([30, 20, 10, 5], type=pa.int64()),
                    "l_extendedprice": pa.array(
                        [9.0, 5.0, 5.0, 7.0], type=pa.float64()
                    ),
                }
            ),
            str(d / "lineitem.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "s_suppkey": pa.array([5, 10, 20, 30], type=pa.int64()),
                    "s_name": pa.array(["e", "a", "b", "c"]),
                }
            ),
            str(d / "supplier.parquet"),
        )
        out = (
            part_cheapest_supplier(str(d))
            .to_pandas()
            .sort_values("p_partkey")
            .reset_index(drop=True)
        )
        # part 1: price tie 5.0 between supp 20 and 10 -> smaller suppkey
        assert out["s_suppkey"].tolist() == [10, 5]
        assert out["s_name"].tolist() == ["a", "e"]
        assert out["best_price"].tolist() == [5.0, 7.0]


class TestTTR:
    def test_distinct_and_totals(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import lang_type_token_ratio

        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "lang": pa.array(["en", "en", "fr"]),
                    "text": pa.array(["a b a", "b c", "x x x x"]),
                }
            ),
            str(d / "documents.parquet"),
        )
        out = lang_type_token_ratio(str(d)).to_pandas().set_index("lang")
        assert out.loc["en", "n_tokens"] == 5
        assert out.loc["en", "n_distinct"] == 3
        assert out.loc["en", "ttr"] == 3.0 / 5.0
        assert out.loc["fr", "n_tokens"] == 4
        assert out.loc["fr", "n_distinct"] == 1


class TestRollingActive:
    def test_window_and_presence(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import rolling_active_users

        d = tmp_path / "sf"
        d.mkdir()
        day = np.timedelta64(1, "D")
        t0 = np.datetime64("2024-01-01T12:00:00", "us")
        # day 0: users 1,2; day 3: user 3; day 10: user 1
        uid = [1, 2, 3, 1]
        ts = [t0, t0, t0 + 3 * day, t0 + 10 * day]
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array(uid, type=pa.int64()),
                    "ts": pa.array(ts, type=pa.timestamp("us")),
                }
            ),
            str(d / "events.parquet"),
        )
        out = rolling_active_users(str(d)).to_pandas()
        base = int(
            (t0.astype("datetime64[D]") - np.datetime64("1970-01-01"))
            .astype(int)
        )
        got = dict(zip(out["day"], out["active_7d"]))
        # only PRESENT days are reported
        assert set(got) == {base, base + 3, base + 10}
        assert got[base] == 2          # users 1,2
        assert got[base + 3] == 3      # 1,2 (day 0) + 3
        assert got[base + 10] == 1     # only user 1 (day 3 is 7 back)


class TestClickToPurchase:
    def test_first_click_rule(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import click_to_purchase_median

        d = tmp_path / "sf"
        d.mkdir()
        us = np.timedelta64(1, "us")
        t0 = np.datetime64("2024-01-01T00:00:00", "us")
        # user 1: click@0, purchase@100 -> 100
        # user 2: purchase@5 BEFORE click@10, purchase@40 -> 30
        # user 3: click only -> excluded
        rows = [
            (1, t0, "click"), (1, t0 + 100 * us, "purchase"),
            (2, t0 + 5 * us, "purchase"), (2, t0 + 10 * us, "click"),
            (2, t0 + 40 * us, "purchase"),
            (3, t0, "click"),
        ]
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
                    "ts": pa.array([r[1] for r in rows],
                                   type=pa.timestamp("us")),
                    "event_type": pa.array([r[2] for r in rows]),
                }
            ),
            str(d / "events.parquet"),
        )
        out = click_to_purchase_median(str(d)).to_pandas()
        assert out.loc[0, "n_users"] == 2
        assert out.loc[0, "median_delta_us"] == 65.0  # (100+30)/2


class TestPareto:
    def test_threshold_ties_and_brute(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import user_value_pareto

        d = tmp_path / "sf"
        d.mkdir()
        rng = np.random.default_rng(17)
        n = 3000
        uid = rng.integers(0, 400, n).astype(np.int64)
        # coarse grid forces ties at the threshold value
        val = (rng.integers(0, 50, n) * 7).astype(np.float64) / 100.0
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array(uid),
                    "value": pa.array(val, type=pa.float64()),
                }
            ),
            str(d / "events.parquet"),
        )
        out = user_value_pareto(str(d)).to_pandas()
        cents = np.floor(val * 100.0).astype(np.int64)
        tot = np.zeros(400, dtype=np.int64)
        np.add.at(tot, uid, cents)
        v = np.sort(tot[np.unique(uid)])[::-1]
        total = int(v.sum())
        cum = np.cumsum(v)
        want = int(np.flatnonzero(5 * cum >= 4 * total).min()) + 1
        assert out.loc[0, "n_users"] == len(np.unique(uid))
        assert out.loc[0, "total_cents"] == total
        assert out.loc[0, "n_users_80"] == want


class TestSourceDupRate:
    def test_cross_source_dups_count(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import source_dup_rate

        d = tmp_path / "sf"
        d.mkdir()
        # "x" appears in a AND b (cross-source dup); "y" twice within a;
        # "z"/"w" unique
        pq.write_table(
            pa.table(
                {
                    "text": pa.array(["x", "y", "y", "z", "x", "w"]),
                    "source": pa.array(["a", "a", "a", "a", "b", "b"]),
                }
            ),
            str(d / "documents.parquet"),
        )
        out = source_dup_rate(str(d)).to_pandas().set_index("source")
        assert out.loc["a", "n_docs"] == 4
        assert out.loc["a", "n_duped"] == 3  # x, y, y
        assert out.loc["b", "n_docs"] == 2
        assert out.loc["b", "n_duped"] == 1  # x
        assert out.loc["a", "dup_rate"] == 3.0 / 4.0


class TestFixedKSample:
    def test_exactly_k_and_proportional(self, ray_session):
        from libpostal_ray.pipelines.queries import stratified_fixed_k_sample

        out = stratified_fixed_k_sample(SF).to_pandas()
        assert len(out) == 100
        # quotas proportional to stratum sizes within 1 (Hamilton)
        import pyarrow.parquet as _pq

        langs = _pq.read_table(
            f"{SF}/documents.parquet", columns=["lang"]
        )["lang"].to_pylist()
        from collections import Counter

        nl = Counter(langs)
        tot = sum(nl.values())
        got = out.groupby("lang").size()
        for lang, q in got.items():
            ideal = 100 * nl[lang] / tot
            assert abs(q - ideal) < 1.0 + 1e-9, (lang, q, ideal)


def test_profile_drift_empty_corpus(ray_session, tmp_path):
    from libpostal_ray.pipelines.queries import documents_profile_drift

    d = tmp_path / "sf_empty"
    d.mkdir()
    schema = pq.read_schema(f"{SF}/documents.parquet")
    pq.write_table(schema.empty_table(), str(d / "documents.parquet"))
    out = documents_profile_drift(str(d)).to_pandas()
    assert len(out) == 0


def test_session13_queries_on_empty_corpus(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    src = SF
    d = tmp_path / "sf_empty"
    d.mkdir()
    for t in (
        "events", "lineitem", "orders", "customer", "documents",
        "nation", "part", "supplier", "region",
    ):
        schema = pq.read_schema(f"{src}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    qs = entrymod.queries()
    for name in (
        "tpch_q13_custdist",
        "tpch_q4_late_shipments",
        "user_longest_streak",
        "user_interevent_median",
        "event_value_deciles",
        "segment_acctbal_gini",
        "customer_rfm",
        "event_nearest_order",
        "user_out_of_order_events",
        "events_daily_autocorr",
        "dup_cluster_histogram",
        "source_mixture_weights",
        "events_anomaly_hours",
        "order_fulfillment_lag",
        "tpch_q6_forecast_revenue",
        "tpch_q10_returned",
        "tpch_q14_promo_share",
        "part_cheapest_supplier",
        "lang_type_token_ratio",
        "rolling_active_users",
        "click_to_purchase_median",
        "user_value_pareto",
        "source_dup_rate",
        "stratified_fixed_k_sample",
        "lineitem_rate_grid",
        "orders_weekday_seasonality",
        "tpch_q7_nation_volume",
        "tpch_q21_waiting_suppliers",
        "tpch_q8_market_share",
        "tpch_q15_top_supplier",
        "tpch_q17_small_quantity_revenue",
        "tpch_q19_bracket_revenue",
    ):
        res = qs[name](str(d))
        df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
        assert len(df) == 0, (name, df.head())


class TestAffineGap:
    def test_brute_force_and_gap_preference(self):
        from libpostal_ray.functions.similarity import (
            affine_gap_distance,
            affine_gap_similarity,
        )

        # Gotoh reference, plain triple-matrix python
        def brute(a, b, mismatch=2, o=2, e=1):
            BIG = 1 << 40
            n, m = len(a), len(b)
            M = [[BIG] * (m + 1) for _ in range(n + 1)]
            X = [[BIG] * (m + 1) for _ in range(n + 1)]
            Y = [[BIG] * (m + 1) for _ in range(n + 1)]
            M[0][0] = 0
            for j in range(1, m + 1):
                X[0][j] = o + e * j
            for i in range(1, n + 1):
                Y[i][0] = o + e * i

            def D(i, j):
                return (
                    0
                    if (i, j) == (0, 0)
                    else min(M[i][j], X[i][j], Y[i][j])
                )

            for i in range(1, n + 1):
                for j in range(1, m + 1):
                    M[i][j] = D(i - 1, j - 1) + (
                        0 if a[i - 1] == b[j - 1] else mismatch
                    )
                    X[i][j] = min(D(i, j - 1) + o + e, X[i][j - 1] + e)
                    Y[i][j] = min(D(i - 1, j) + o + e, Y[i - 1][j] + e)
            return D(n, m)

        import random

        rng = random.Random(11)
        for _ in range(300):
            a = "".join(rng.choice("abc") for _ in range(rng.randint(0, 8)))
            b = "".join(rng.choice("abc") for _ in range(rng.randint(0, 8)))
            assert affine_gap_distance(a, b) == brute(a, b), (a, b)
        # ONE contiguous gap is cheaper than the same chars scattered
        assert affine_gap_distance("aaabbbccc", "aaaccc") == 5
        assert affine_gap_distance("aXbXcX", "abc") == 9
        assert affine_gap_similarity("streetname", "streetname") == 1.0
        # long-token soft match rides the affine channel
        from libpostal_ray.functions.similarity import soft_token_similarity

        assert (
            soft_token_similarity(
                "international airportterminal", "international airporterminal"
            )
            == 1.0
        )


class TestFertility:
    def test_fertility_identity(self, ray_session):
        from libpostal_ray.pipelines.queries import bpe_fertility_by_lang

        out = bpe_fertility_by_lang(SF).to_pandas()
        assert len(out) == 5
        # every language: tokens >= words (BPE with 12 merges can only
        # merge, never split below one token per word... actually tokens
        # count sub-word units so tokens >= words always holds)
        assert (out["n_tokens"] >= out["n_words"]).all()
        assert np.allclose(out["fertility"], out["n_tokens"] / out["n_words"])
        assert (out["fertility"] >= 1.0).all()

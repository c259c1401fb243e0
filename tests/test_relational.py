"""Unit tests for the temporal relational operators (pipelines/relational.py):
as-of join, interval-count range join, sliding-window aggregate.  Small
in-memory datasets with hand-computed expectations; the DuckDB oracle parity
at corpus scale lives in test_oracle_parity.py."""

import os
import sys

import numpy as np
import pyarrow as pa
import pytest
import ray.data

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libpostal_ray.pipelines.relational import (  # noqa: E402
    asof_join,
    interval_count_join,
    sliding_window_count_sum,
)


def _ds(**cols):
    return ray.data.from_arrow(pa.table(cols))


BOTH_PLANS = [2_000_000, 0]  # default broadcast crossover vs forced exchange


class TestAsofJoin:
    @pytest.mark.parametrize("bmax", BOTH_PLANS)
    def test_backward_exact(self, ray_session, bmax):
        left = _ds(
            k=pa.array([1, 1, 1, 2], type=pa.int64()),
            t=pa.array([10, 20, 5, 10], type=pa.int64()),
            lv=pa.array(["a", "b", "c", "d"]),
        )
        right = _ds(
            rk=pa.array([1, 1, 2, 3], type=pa.int64()),
            rt=pa.array([10, 15, 99, 1], type=pa.int64()),
            rv=pa.array([100, 200, 300, 400], type=pa.int64()),
        )
        out = asof_join(
            left, right, on=("k", "rk"), ts=("t", "rt"), how="inner",
            broadcast_max=bmax,
        ).to_pandas().sort_values(["k", "t"]).reset_index(drop=True)
        # k=1 t=5: no right <= 5 -> dropped.  t=10: exact match rt=10 (rv=100).
        # t=20: most recent rt=15 (rv=200).  k=2 t=10: rt=99 > 10 -> dropped.
        assert out[["k", "t", "rv"]].values.tolist() == [[1, 10, 100], [1, 20, 200]]
        assert out["rt_matched"].tolist() == [10, 15]

    @pytest.mark.parametrize("bmax", BOTH_PLANS)
    def test_left_join_nulls(self, ray_session, bmax):
        left = _ds(k=pa.array([7], type=pa.int64()), t=pa.array([1], type=pa.int64()))
        right = _ds(
            rk=pa.array([7], type=pa.int64()),
            rt=pa.array([5], type=pa.int64()),
            rv=pa.array([9], type=pa.int64()),
        )
        out = asof_join(
            left, right, on=("k", "rk"), ts=("t", "rt"), how="left",
            broadcast_max=bmax,
        ).to_pandas()
        assert len(out) == 1 and out["rv"].isna().all()

    @pytest.mark.parametrize("bmax", BOTH_PLANS)
    def test_tie_break_max_wins(self, ray_session, bmax):
        left = _ds(k=pa.array([1], type=pa.int64()), t=pa.array([50], type=pa.int64()))
        right = _ds(
            rk=pa.array([1, 1, 1], type=pa.int64()),
            rt=pa.array([40, 40, 40], type=pa.int64()),
            rid=pa.array([3, 9, 5], type=pa.int64()),
        )
        out = asof_join(
            left, right, on=("k", "rk"), ts=("t", "rt"),
            tie_break="rid", how="inner", broadcast_max=bmax,
        ).to_pandas()
        assert out["rid"].tolist() == [9]

    def test_payload_collision_raises(self, ray_session):
        a = _ds(k=pa.array([1], type=pa.int64()), t=pa.array([1], type=pa.int64()),
                x=pa.array([1], type=pa.int64()))
        b = _ds(rk=pa.array([1], type=pa.int64()), rt=pa.array([1], type=pa.int64()),
                x=pa.array([2], type=pa.int64()))
        with pytest.raises(ValueError, match="collision"):
            asof_join(a, b, on=("k", "rk"), ts=("t", "rt"))


class TestIntervalCountJoin:
    @pytest.mark.parametrize("bmax", BOTH_PLANS)
    def test_open_closed_window(self, ray_session, bmax):
        # interval at t=10, window 5 -> (10, 15]: points 10 excluded,
        # 11 and 15 counted, 16 excluded
        points = _ds(
            pk=pa.array([1, 1, 1, 1], type=pa.int64()),
            pt=pa.array([10, 11, 15, 16], type=pa.int64()),
        )
        ivals = _ds(
            ik=pa.array([1, 2], type=pa.int64()),
            it=pa.array([10, 10], type=pa.int64()),
            tag=pa.array(["x", "y"]),
        )
        out = interval_count_join(
            points, ivals, point_key="pk", point_ts="pt",
            interval_key="ik", interval_ts="it", window_us=5,
            broadcast_max=bmax,
        ).to_pandas()
        assert len(out) == 1  # ik=2 has no points at all
        assert out.iloc[0]["tag"] == "x"
        assert out.iloc[0]["n_points"] == 2
        assert out.iloc[0]["first_point_us"] == 11

    @pytest.mark.parametrize("bmax", BOTH_PLANS)
    def test_closed_both_includes_anchor(self, ray_session, bmax):
        points = _ds(pk=pa.array([1], type=pa.int64()), pt=pa.array([10], type=pa.int64()))
        ivals = _ds(ik=pa.array([1], type=pa.int64()), it=pa.array([10], type=pa.int64()))
        out = interval_count_join(
            points, ivals, point_key="pk", point_ts="pt",
            interval_key="ik", interval_ts="it", window_us=5, closed="both",
            broadcast_max=bmax,
        ).to_pandas()
        assert out["n_points"].tolist() == [1]

    @pytest.mark.parametrize("bmax", BOTH_PLANS)
    def test_matches_bruteforce_random(self, ray_session, bmax):
        rng = np.random.default_rng(7)
        n_p, n_i, W = 300, 80, 1000
        pk = rng.integers(0, 5, n_p).astype(np.int64)
        pt = rng.integers(0, 10_000, n_p).astype(np.int64)
        ik = rng.integers(0, 6, n_i).astype(np.int64)
        it = rng.integers(0, 10_000, n_i).astype(np.int64)
        iid = np.arange(n_i, dtype=np.int64)
        out = interval_count_join(
            _ds(pk=pa.array(pk), pt=pa.array(pt)),
            _ds(ik=pa.array(ik), it=pa.array(it), iid=pa.array(iid)),
            point_key="pk", point_ts="pt",
            interval_key="ik", interval_ts="it", window_us=W,
            broadcast_max=bmax,
        ).to_pandas().set_index("iid")
        for j in range(n_i):
            m = (pk == ik[j]) & (pt > it[j]) & (pt <= it[j] + W)
            if m.sum() == 0:
                assert j not in out.index
            else:
                assert out.loc[j, "n_points"] == m.sum()
                assert out.loc[j, "first_point_us"] == pt[m].min()


class TestSlidingWindow:
    def test_counts_and_sums(self, ray_session):
        # slide=10ms, window=20ms (R=2); events at t=5ms (v=1.0), t=15ms (v=2.5)
        ds = _ds(
            ts=pa.array([5_000, 15_000], type=pa.int64()),
            value=pa.array([1.0, 2.5], type=pa.float64()),
        )
        out = (
            sliding_window_count_sum(
                ds, ts_col="ts", value_col="value",
                window_us=20_000, slide_us=10_000,
            )
            .to_pandas()
            .sort_values("window_start_ms")
            .reset_index(drop=True)
        )
        # buckets: t=5ms -> b0, t=15ms -> b1.  Window starts (ms): -10
        # (covers b0 only), 0 (b0+b1), 10 (b1 only).
        assert out["window_start_ms"].tolist() == [-10, 0, 10]
        assert out["n_events"].tolist() == [1, 2, 1]
        assert out["sum_value_cents"].tolist() == [100, 350, 250]

    def test_window_not_multiple_raises(self, ray_session):
        ds = _ds(ts=pa.array([1], type=pa.int64()), value=pa.array([1.0]))
        with pytest.raises(ValueError):
            sliding_window_count_sum(
                ds, ts_col="ts", value_col="value", window_us=25_000, slide_us=10_000
            )
        with pytest.raises(ValueError):
            sliding_window_count_sum(
                ds, ts_col="ts", value_col="value", window_us=20, slide_us=10
            )


class TestBroadcastPlanEquivalence:
    """The broadcast composite-rank plan and the key%P exchange plan must
    be output-identical — same discipline as
    test_join_verify_path_matches_broadcast for the flagship."""

    def _norm(self, ds, cols):
        return ds.to_pandas().sort_values(cols).reset_index(drop=True)

    def test_asof_plans_agree_at_corpus_scale(self, ray_session):
        import pandas as pd

        from libpostal_ray.pipelines.queries import _strip_meta

        sf = "/root/testdata/sf0.001"
        def sides():
            ev = ray.data.read_parquet(
                f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"]
            ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
            od = ray.data.read_parquet(
                f"{sf}/orders.parquet",
                columns=["o_orderkey", "o_custkey", "o_orderdate"],
            ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
            return ev, od

        outs = []
        for bmax in (2_000_000, 0):
            ev, od = sides()
            outs.append(self._norm(
                asof_join(
                    ev, od, on=("user_id", "o_custkey"), ts=("ts", "o_orderdate"),
                    tie_break="o_orderkey", how="inner", broadcast_max=bmax,
                ),
                ["event_id"],
            ))
        assert len(outs[0]) > 0
        pd.testing.assert_frame_equal(outs[0], outs[1][outs[0].columns])

    def test_interval_plans_agree_at_corpus_scale(self, ray_session):
        import pandas as pd

        from libpostal_ray.pipelines.queries import _strip_meta

        sf = "/root/testdata/sf0.001"
        def sides():
            ev = f"{sf}/events.parquet"
            clicks = (
                ray.data.read_parquet(
                    ev, columns=["event_id", "user_id", "ts", "event_type"]
                )
                .map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
                .filter(expr="event_type == 'click'")
                .drop_columns(["event_type"])
            )
            purch = (
                ray.data.read_parquet(ev, columns=["user_id", "ts", "event_type"])
                .map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
                .filter(expr="event_type == 'purchase'")
                .drop_columns(["event_type"])
            )
            return purch, clicks

        outs = []
        for bmax in (2_000_000, 0):
            purch, clicks = sides()
            outs.append(self._norm(
                interval_count_join(
                    purch, clicks, point_key="user_id", point_ts="ts",
                    interval_key="user_id", interval_ts="ts",
                    window_us=6 * 3600 * 1_000_000, broadcast_max=bmax,
                ),
                ["event_id"],
            ))
        assert len(outs[0]) > 0
        pd.testing.assert_frame_equal(outs[0], outs[1][outs[0].columns])

    def test_asof_broadcast_empty_right(self, ray_session):
        left = _ds(k=pa.array([1], type=pa.int64()), t=pa.array([5], type=pa.int64()))
        right = _ds(
            rk=pa.array([], type=pa.int64()),
            rt=pa.array([], type=pa.int64()),
            rv=pa.array([], type=pa.int64()),
        )
        inner = asof_join(left, right, on=("k", "rk"), ts=("t", "rt")).to_pandas()
        assert len(inner) == 0
        lo = asof_join(
            left, right, on=("k", "rk"), ts=("t", "rt"), how="left"
        ).to_pandas()
        assert len(lo) == 1 and lo["rv"].isna().all()

    def test_interval_broadcast_empty_points(self, ray_session):
        points = _ds(pk=pa.array([], type=pa.int64()), pt=pa.array([], type=pa.int64()))
        ivals = _ds(ik=pa.array([1], type=pa.int64()), it=pa.array([1], type=pa.int64()))
        out = interval_count_join(
            points, ivals, point_key="pk", point_ts="pt",
            interval_key="ik", interval_ts="it", window_us=10,
        ).to_pandas()
        assert len(out) == 0


class TestIntervalJoinPairs:
    def test_pairs_and_cap(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray

        from libpostal_ray.pipelines.relational import interval_join_pairs

        # user 1: click at t=0; purchases at 1, 2, 3, 100 (window 10)
        # user 2: click at t=5; no purchases in window
        def ds(rows, id_name):
            return ray.data.from_arrow(
                pa.table(
                    {
                        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
                        "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
                        id_name: pa.array([r[2] for r in rows], type=pa.int64()),
                    }
                )
            )

        clicks = ds([(1, 0, 10), (2, 5, 20)], "click_id")
        purchases = ds(
            [(1, 1, 101), (1, 2, 102), (1, 3, 103), (1, 100, 104), (2, 50, 201)],
            "purchase_id",
        )
        out = interval_join_pairs(
            purchases, clicks,
            point_key="user_id", point_ts="ts", point_id="purchase_id",
            interval_key="user_id", interval_ts="ts", interval_id="click_id",
            window_us=10, closed="right",
        ).to_pandas().sort_values(["click_id", "purchase_id"]).reset_index(drop=True)
        assert list(zip(out.click_id, out.purchase_id, out.gap_us)) == [
            (10, 101, 1), (10, 102, 2), (10, 103, 3)
        ]
        assert not out.truncated.any()

        capped = interval_join_pairs(
            purchases, clicks,
            point_key="user_id", point_ts="ts", point_id="purchase_id",
            interval_key="user_id", interval_ts="ts", interval_id="click_id",
            window_us=10, closed="right", per_interval_cap=2,
        ).to_pandas().sort_values("purchase_id").reset_index(drop=True)
        # cap keeps the EARLIEST 2 and flags them truncated
        assert out is not None
        assert capped.purchase_id.tolist() == [101, 102]
        assert capped.truncated.all()

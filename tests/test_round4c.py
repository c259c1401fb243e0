"""Round-4 session-12 additions: Simpson diversity, TPC-H Q3 analog,
inverted-index postings — unit edges the 3-SF oracle parity can't see."""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write(tbl: pa.Table, path: str) -> None:
    pq.write_table(tbl, path)


class TestUserEventDiversity:
    def test_exact_values_tiny(self, ray_session, tmp_path):
        """Hand-computed Simpson: user 1 has [a,a,b] -> 1 - (4+1)/9 = 4/9;
        user 2 all same type -> 0.0; user 3 one event -> 0.0."""
        from libpostal_ray.pipelines.queries import user_event_diversity

        d = tmp_path / "sf"
        d.mkdir()
        _write(
            pa.table(
                {
                    "event_id": pa.array(range(6), type=pa.int64()),
                    "ts": pa.array([0] * 6, type=pa.timestamp("us")),
                    "user_id": pa.array([1, 1, 1, 2, 2, 3], type=pa.int64()),
                    "event_type": pa.array(["a", "a", "b", "x", "x", "y"]),
                    "value": pa.array([0.0] * 6),
                    "props": pa.array(["{}"] * 6),
                }
            ),
            str(d / "events.parquet"),
        )
        out = (
            user_event_diversity(str(d))
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert out["n_events"].tolist() == [3, 2, 1]
        assert out.loc[0, "diversity"] == (9 - 5) / 9.0  # exact division
        assert out.loc[1, "diversity"] == 0.0
        assert out.loc[2, "diversity"] == 0.0

    def test_blocking_independence(self, ray_session, tmp_path):
        """Result identical whether events arrive as 1 block or many —
        the partial counts reduce associatively (pure int64)."""
        import ray

        from libpostal_ray.pipelines.queries import user_event_diversity

        rng = np.random.default_rng(7)
        n = 5000
        tbl = pa.table(
            {
                "event_id": pa.array(range(n), type=pa.int64()),
                "ts": pa.array([0] * n, type=pa.timestamp("us")),
                "user_id": pa.array(
                    rng.integers(0, 40, n).astype(np.int64)
                ),
                "event_type": pa.array(
                    np.array(list("abcdefgh"))[rng.integers(0, 8, n)]
                ),
                "value": pa.array(np.zeros(n)),
                "props": pa.array(["{}"] * n),
            }
        )
        d1 = tmp_path / "one"
        d2 = tmp_path / "many"
        for dd in (d1, d2):
            dd.mkdir()
        _write(tbl, str(d1 / "events.parquet"))
        pq.write_table(tbl, str(d2 / "events.parquet"), row_group_size=137)
        a = (
            user_event_diversity(str(d1))
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        b = (
            user_event_diversity(str(d2))
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)  # bit-exact incl. diversity


class TestTpchQ3:
    def test_tie_break_and_filters(self, ray_session, tmp_path):
        """Two orders with identical revenue -> lower orderkey first;
        non-BUILDING customers and out-of-window dates excluded."""
        from libpostal_ray.pipelines.queries import tpch_q3_top_orders

        d = tmp_path / "sf"
        d.mkdir()
        _write(
            pa.table(
                {
                    "c_custkey": pa.array([1, 2], type=pa.int64()),
                    "c_name": pa.array(["a", "b"]),
                    "c_nationkey": pa.array([0, 0], type=pa.int32()),
                    "c_acctbal": pa.array([0.0, 0.0]),
                    "c_mktsegment": pa.array(["BUILDING", "AUTOMOBILE"]),
                }
            ),
            str(d / "customer.parquet"),
        )
        early = np.datetime64("1997-06-01T00:00:00", "us")
        late = np.datetime64("1999-01-01T00:00:00", "us")
        _write(
            pa.table(
                {
                    "o_orderkey": pa.array([10, 11, 12, 13], type=pa.int64()),
                    "o_custkey": pa.array([1, 1, 2, 1], type=pa.int64()),
                    "o_orderstatus": pa.array(["O"] * 4),
                    "o_totalprice": pa.array([0.0] * 4),
                    # order 13 placed after the cutoff -> excluded
                    "o_orderdate": pa.array(
                        [early, early, early, late], type=pa.timestamp("us")
                    ),
                    "o_orderpriority": pa.array(["1-URGENT"] * 4),
                }
            ),
            str(d / "orders.parquet"),
        )
        ship = np.datetime64("1998-06-01T00:00:00", "us")
        _write(
            pa.table(
                {
                    "l_orderkey": pa.array(
                        [10, 11, 12, 13, 10], type=pa.int64()
                    ),
                    "l_partkey": pa.array([0] * 5, type=pa.int64()),
                    "l_suppkey": pa.array([0] * 5, type=pa.int64()),
                    "l_linenumber": pa.array([1] * 5, type=pa.int32()),
                    "l_quantity": pa.array([1.0] * 5),
                    "l_extendedprice": pa.array(
                        [100.0, 100.0, 100.0, 100.0, 0.0]
                    ),
                    "l_discount": pa.array([0.0] * 5),
                    "l_tax": pa.array([0.0] * 5),
                    "l_returnflag": pa.array(["N"] * 5),
                    "l_linestatus": pa.array(["O"] * 5),
                    "l_shipdate": pa.array([ship] * 5, type=pa.timestamp("us")),
                }
            ),
            str(d / "lineitem.parquet"),
        )
        out = tpch_q3_top_orders(str(d)).to_pandas()
        # orders 10 and 11 tie at 10000 cents -> 10 first; 12 (wrong
        # segment) and 13 (late orderdate) never appear
        assert out["l_orderkey"].tolist() == [10, 11]
        assert out["revenue_cents"].tolist() == [10000, 10000]


class TestTermPostings:
    def test_threshold_and_sorted_postings(self, ray_session, tmp_path):
        """df*50 >= n_docs gate; postings sorted ascending and distinct
        even when a term repeats inside one document."""
        from libpostal_ray.pipelines.queries import term_postings

        d = tmp_path / "sf"
        d.mkdir()
        n = 100
        texts = []
        for i in range(n):
            parts = ["common", "common"]  # repeats must not inflate df
            if i % 50 == 0:
                parts.append("rare")  # df=2 exactly meets 2% of 100
            if i == 7:
                parts.append("once")  # df=1 -> below threshold
            texts.append(" ".join(parts))
        _write(
            pa.table(
                {
                    "doc_id": pa.array(range(n), type=pa.int64()),
                    "text": pa.array(texts),
                    "lang": pa.array(["en"] * n),
                    "source": pa.array(["s"] * n),
                    "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
                }
            ),
            str(d / "documents.parquet"),
        )
        out = (
            term_postings(str(d))
            .to_pandas()
            .sort_values("term")
            .reset_index(drop=True)
        )
        assert out["term"].tolist() == ["common", "rare"]
        assert out.loc[0, "df"] == 100
        assert out.loc[1, "df"] == 2
        assert out.loc[1, "postings"] == "0,50"
        ids = list(map(int, out.loc[0, "postings"].split(",")))
        assert ids == sorted(ids) == list(range(100))


def test_session12_queries_on_empty_corpus(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    src = "/root/testdata/sf0.001"
    d = tmp_path / "sf_empty"
    d.mkdir()
    for t in ("documents", "events", "lineitem", "orders", "customer"):
        schema = pq.read_schema(f"{src}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    qs = entrymod.queries()
    for name in (
        "user_event_diversity",
        "tpch_q3_top_orders",
        "term_postings",
    ):
        res = qs[name](str(d))
        df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
        assert len(df) == 0, (name, df.head())

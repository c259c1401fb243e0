"""Round-4 session-14 operators: TPC-H Q18/Q16/Q22 analogs and the
session's data-quality / analysis additions.  DuckDB value parity lives
in test_oracle_parity.py; these tests pin semantics and edge cases."""

import os
import sys

import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


class TestQ18LargeOrders:
    def test_every_row_exceeds_threshold(self, ray_session):
        from libpostal_ray.pipelines.queries import tpch_q18_large_orders

        out = tpch_q18_large_orders(SF).to_pandas()
        assert len(out) > 0
        assert (out["sum_qty"] > 250).all()
        # each orderkey appears once (HAVING is per order)
        assert out["o_orderkey"].is_unique
        # the customer name matches the customer table
        cust = pq.read_table(
            f"{SF}/customer.parquet", columns=["c_custkey", "c_name"]
        ).to_pandas().set_index("c_custkey")["c_name"]
        for _, r in out.iterrows():
            assert r["c_name"] == cust.loc[r["c_custkey"]]

    def test_threshold_monotone(self, ray_session):
        from libpostal_ray.pipelines.queries import tpch_q18_large_orders

        lo = tpch_q18_large_orders(SF, min_qty=200).to_pandas()
        hi = tpch_q18_large_orders(SF, min_qty=300).to_pandas()
        assert set(hi["o_orderkey"]) <= set(lo["o_orderkey"])


class TestQ16SupplierCounts:
    def test_exclusions_hold(self, ray_session):
        from libpostal_ray.pipelines.queries import tpch_q16_supplier_counts

        out = tpch_q16_supplier_counts(SF).to_pandas()
        assert len(out) > 0
        assert (out["p_brand"] != "Brand#13").all()
        assert (out["p_type"] != "PROMO").all()
        assert (out["supplier_cnt"] >= 1).all()


class TestQ22Dormant:
    def test_balances_above_positive_average(self, ray_session):
        from libpostal_ray.pipelines.queries import tpch_q22_dormant_customers

        out = tpch_q22_dormant_customers(SF).to_pandas()
        assert len(out) > 0
        cust = pq.read_table(
            f"{SF}/customer.parquet", columns=["c_acctbal"]
        ).to_pandas()["c_acctbal"]
        avg_pos = cust[cust > 0].mean()
        # every counted balance is above the positive average, so each
        # nation's mean of counted balances must exceed it too
        assert (
            out["tot_cents"] / out["numcust"] > avg_pos * 100 - 1
        ).all()


class TestQ11ImportantParts:
    def test_threshold_scale_free(self, ray_session):
        from libpostal_ray.pipelines.queries import tpch_q11_important_parts

        out = tpch_q11_important_parts(SF).to_pandas()
        assert len(out) > 0
        # stricter multiplier selects a subset
        strict = tpch_q11_important_parts(SF, mult=3).to_pandas()
        assert set(strict["p_partkey"]) <= set(out["p_partkey"])


class TestRecon:
    def test_planted_consistent_order(self, ray_session, tmp_path):
        import pyarrow as pa
        from libpostal_ray.pipelines.queries import orders_totalprice_recon

        d = tmp_path / "sf"
        d.mkdir()
        # one consistent order, one off by 7 cents
        li = pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2], type=pa.int64()),
                "l_extendedprice": pa.array([100.0, 50.0, 10.0]),
                "l_discount": pa.array([0.0, 0.0, 0.0]),
                "l_tax": pa.array([0.0, 0.0, 0.0]),
            }
        )
        od = pa.table(
            {
                "o_orderkey": pa.array([1, 2], type=pa.int64()),
                "o_orderstatus": pa.array(["F", "F"]),
                "o_totalprice": pa.array([150.0, 10.07]),
            }
        )
        pq.write_table(li, str(d / "lineitem.parquet"))
        pq.write_table(od, str(d / "orders.parquet"))
        out = orders_totalprice_recon(str(d)).to_pandas()
        assert len(out) == 1
        r = out.iloc[0]
        assert r["n_orders"] == 2
        assert r["n_mismatch"] == 1
        assert r["sum_absdiff_cents"] == 7


class TestBenford:
    def test_counts_sum_to_orders(self, ray_session):
        from libpostal_ray.pipelines.queries import orders_benford

        out = orders_benford(SF).to_pandas()
        n_orders = pq.read_metadata(f"{SF}/orders.parquet").num_rows
        assert out["n"].sum() == n_orders  # min totalprice >> 1
        assert set(out["digit"]) <= set(range(1, 10))


class TestOverlap:
    def test_planted_overlap(self, ray_session, tmp_path):
        import pyarrow as pa
        from libpostal_ray.pipelines.queries import event_type_user_overlap

        d = tmp_path / "sf"
        d.mkdir()
        # users 1,2 fire A+B loudly; user 3 fires A loudly, B quietly
        ev = pa.table(
            {
                "user_id": pa.array([1, 1, 2, 2, 3, 3], type=pa.int64()),
                "event_type": pa.array(["A", "B", "A", "B", "A", "B"]),
                "value": pa.array([300.0, 300.0, 300.0, 300.0, 300.0, 1.0]),
            }
        )
        pq.write_table(ev, str(d / "events.parquet"))
        out = event_type_user_overlap(str(d)).to_pandas()
        assert len(out) == 1
        assert out.iloc[0]["type_a"] == "A"
        assert out.iloc[0]["type_b"] == "B"
        assert out.iloc[0]["n_shared"] == 2


class TestCorrMatrix:
    def test_bounds_and_planted_perfect(self, ray_session, tmp_path):
        import pyarrow as pa
        from libpostal_ray.pipelines.queries import lineitem_corr_matrix

        out = lineitem_corr_matrix(SF).to_pandas()
        assert len(out) == 6
        assert (out["corr"].abs() <= 1.0 + 1e-12).all()

        # planted: ep == qty (perfect +1), tax == -? (tax can't be
        # negative; use descending for corr -1 against qty)
        d = tmp_path / "sf"
        d.mkdir()
        q = [1.0, 2.0, 3.0, 4.0]
        li = pa.table(
            {
                "l_quantity": pa.array(q),
                "l_extendedprice": pa.array([v * 2 for v in q]),
                "l_discount": pa.array([0.04, 0.03, 0.02, 0.01]),
                "l_tax": pa.array([0.01, 0.02, 0.03, 0.04]),
            }
        )
        pq.write_table(li, str(d / "lineitem.parquet"))
        out = lineitem_corr_matrix(str(d)).to_pandas().set_index(
            ["col_a", "col_b"]
        )
        assert abs(out.loc[("l_quantity", "l_extendedprice"), "corr"] - 1.0) < 1e-12
        assert abs(out.loc[("l_quantity", "l_discount"), "corr"] + 1.0) < 1e-12
        assert abs(out.loc[("l_quantity", "l_tax"), "corr"] - 1.0) < 1e-12


class TestExpectations:
    def test_clean_corpus_zero_violations(self, ray_session):
        from libpostal_ray.pipelines.queries import documents_expectations

        out = documents_expectations(SF).to_pandas().set_index("rule")
        assert len(out) == 5
        assert (out["n_violations"] == 0).all()

    def test_planted_violations(self, ray_session, tmp_path):
        import pyarrow as pa
        from libpostal_ray.pipelines.queries import documents_expectations

        d = tmp_path / "sf"
        d.mkdir()
        docs = pa.table(
            {
                "doc_id": pa.array([1, 1, 2, 3, 4], type=pa.int64()),
                "text": pa.array(["aa", "aa", None, "bbb", "cc"]),
                "lang": pa.array(["en", "en", "EN!", "de", "fra"]),
                "source": pa.array(["s1", "s1", "", "s2", None]),
                "n_chars": pa.array([2, 2, 0, 99, 2], type=pa.int64()),
            }
        )
        pq.write_table(docs, str(d / "documents.parquet"))
        out = documents_expectations(str(d)).to_pandas().set_index("rule")
        assert out.loc["doc_id_unique", "n_violations"] == 1  # dup id 1
        assert out.loc["text_nonnull", "n_violations"] == 1
        # null text counts, plus the n_chars=99 mismatch
        assert out.loc["n_chars_consistent", "n_violations"] == 2
        assert out.loc["lang_format", "n_violations"] == 1  # 'EN!'
        assert out.loc["source_nonempty", "n_violations"] == 2


class TestGroupedMAD:
    def test_planted_values(self, ray_session, tmp_path):
        import pyarrow as pa
        from libpostal_ray.pipelines.queries import events_type_mad

        d = tmp_path / "sf"
        d.mkdir()
        # type A: values 1..5 -> median 3, |dev| = 2,1,0,1,2 -> MAD 1
        # type B: values 10,20,40 -> median 20, devs 10,0,20 -> MAD 10
        ev = pa.table(
            {
                "event_type": pa.array(["A"] * 5 + ["B"] * 3),
                "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 10.0, 20.0, 40.0]),
            }
        )
        pq.write_table(ev, str(d / "events.parquet"))
        out = events_type_mad(str(d)).to_pandas().set_index("event_type")
        assert out.loc["A", "mad"] == 1.0
        assert out.loc["B", "mad"] == 10.0
        assert out.loc["A", "n_events"] == 5


class TestTrigrams:
    def test_planted_sequence(self, ray_session, tmp_path):
        import pyarrow as pa
        from libpostal_ray.pipelines.queries import event_trigrams

        d = tmp_path / "sf"
        d.mkdir()
        # user 1: A B A B -> (A,B,A), (B,A,B); user 2: C C -> no trigram
        ev = pa.table(
            {
                "user_id": pa.array([1, 1, 1, 1, 2, 2], type=pa.int64()),
                "event_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
                "ts": pa.array(
                    [1_000_000 * i for i in range(6)], type=pa.int64()
                ).cast(pa.timestamp("us")),
                "event_type": pa.array(["A", "B", "A", "B", "C", "C"]),
            }
        )
        pq.write_table(ev, str(d / "events.parquet"))
        out = event_trigrams(str(d)).to_pandas()
        got = {
            (r["t1"], r["t2"], r["t3"]): r["n"] for _, r in out.iterrows()
        }
        assert got == {("A", "B", "A"): 1, ("B", "A", "B"): 1}


def test_session14_queries_on_empty_corpus(ray_session, tmp_path):
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
        "tpch_q18_large_orders",
        "tpch_q16_supplier_counts",
        "tpch_q22_dormant_customers",
        "tpch_q9_product_profit",
        "tpch_q11_important_parts",
        "orders_totalprice_recon",
        "orders_benford",
        "event_type_user_overlap",
        "lineitem_corr_matrix",
        "documents_expectations",
        "lang_source_contingency",
        "events_type_mad",
        "event_trigrams",
    ):
        res = qs[name](str(d))
        df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
        assert len(df) == 0, (name, df.head())


class TestWavCodec:
    def test_round_trip_and_features(self, ray_session):
        import numpy as np
        import pyarrow as pa
        from libpostal_ray.stages.multimodal import (
            MediaFeatureStage,
            array_to_wav,
            wav_to_array,
            MEDIA_SCHEMA,
        )

        # round trip: 16-bit quantization only
        t = np.arange(6400, dtype=np.float32) / 8000.0
        sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        payload = array_to_wav(sig, 8000)
        parsed = wav_to_array(payload)
        assert parsed is not None
        got, rate = parsed
        assert rate == 8000
        # encode scales by 32767, decode by 32768: error <= ~1.5 LSB
        assert np.abs(got - sig).max() < 2.0 / 32768

        # loud first half, silent second half -> RMS features reflect it
        half = np.concatenate([sig[:3200], np.zeros(3200, dtype=np.float32)])
        tbl = pa.table(
            {
                "media_id": pa.array([1], type=pa.int64()),
                "media_type": pa.array(["audio"]),
                "payload": pa.array(
                    [array_to_wav(half, 8000)], type=pa.large_binary()
                ),
                "width": pa.array([0], type=pa.int32()),
                "height": pa.array([0], type=pa.int32()),
                "duration_ms": pa.array([800], type=pa.int32()),
            },
            schema=MEDIA_SCHEMA,
        )
        out = MediaFeatureStage()(tbl)  # "auto": real WAV path, no libs
        feat = np.asarray(out["feature"].to_pylist()[0])
        rms = feat[:32]
        assert rms[:16].mean() > 0.2
        assert rms[16:].max() < 1e-6
        # zero-crossing rate of a 440 Hz tone at 8 kHz ~ 0.11
        zcr = feat[32:]
        assert 0.05 < zcr[:16].mean() < 0.2

    def test_non_wav_audio_raises(self, ray_session):
        from libpostal_ray.stages.multimodal import _numpy_audio_feature
        import pytest as _pytest

        with _pytest.raises(NotImplementedError):
            _numpy_audio_feature(b"\x00" * 100)

"""Privacy-audit family: k-anonymity / l-diversity cell audits (round 5).

Planted-fixture units (the synthetic events tables are audited in the
oracle-parity suite; here the semantics are pinned on hand-built data)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from libpostal_ray.pipelines.queries import events_k_anonymity, events_l_diversity


def _write_events(tmp_path, rows):
    """rows: list of (event_type, day, user_id, value)."""
    day_us = 86_400_000_000
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), type=pa.int64()),
            "ts": pa.array(
                [r[1] * day_us + 3600_000_000 for r in rows],
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[0] for r in rows], type=pa.string()),
            "value": pa.array([r[3] for r in rows], type=pa.float64()),
            "props": pa.array(["{}"] * len(rows), type=pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    import pyarrow.parquet as pq

    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


class TestKAnonymity:
    def test_planted_small_cells(self, ray_session, tmp_path):
        # cell A: 6 rows (safe at k=5); cell B: 2 rows; cell C: 1 row
        rows = (
            [("click", 100, 7, 1.0)] * 6
            + [("view", 100, 7, 1.0)] * 2
            + [("click", 101, 7, 1.0)]
        )
        sf = _write_events(tmp_path, rows)
        df = events_k_anonymity(sf).to_pandas().sort_values(
            ["event_type", "day"]
        ).reset_index(drop=True)
        got = list(
            zip(df.event_type, df.day, df.cohort, df.n_rows)
        )
        assert got == [("click", 101, 7, 1), ("view", 100, 7, 2)]

    def test_cohort_is_user_mod_100(self, ray_session, tmp_path):
        sf = _write_events(tmp_path, [("click", 5, 1234, 1.0)])
        df = events_k_anonymity(sf).to_pandas()
        assert df.cohort.tolist() == [34]

    def test_blocking_independent(self, ray_session, tmp_path):
        # the same cell split across many batches must fold to ONE count
        rows = [("click", 100, 7, 1.0)] * 4  # 4 < k=5 -> one violating cell
        sf = _write_events(tmp_path, rows)
        ds = ray.data.read_parquet(f"{sf}/events.parquet").repartition(4)
        import pyarrow.parquet as pq

        pq.write_table(
            pa.concat_tables(
                [b for b in ds.iter_batches(batch_format="pyarrow")]
            ),
            f"{sf}/events.parquet",
        )
        df = events_k_anonymity(sf).to_pandas()
        assert len(df) == 1 and df.n_rows.tolist() == [4]


class TestLDiversity:
    def test_homogeneous_cell_flagged(self, ray_session, tmp_path):
        # cell A: 4 rows all in ONE value bucket -> flagged (n_sens=1 < 3)
        # cell B: 4 rows across 3 buckets (0, 25, 45 -> buckets 0,1,2) -> safe
        # cell C: 2 rows (under k=3) -> never reported
        rows = (
            [("click", 100, 7, 3.0)] * 4
            + [
                ("view", 100, 7, 3.0),
                ("view", 100, 7, 25.0),
                ("view", 100, 7, 45.0),
                ("view", 100, 7, 46.0),
            ]
            + [("signup", 100, 7, 3.0)] * 2
        )
        sf = _write_events(tmp_path, rows)
        df = events_l_diversity(sf).to_pandas()
        assert list(
            zip(df.event_type, df.day, df.cohort, df.n_rows, df.n_sens)
        ) == [("click", 100, 7, 4, 1)]

    def test_bucket_edge_exact(self, ray_session, tmp_path):
        # 19.99 and 20.00 straddle the 2000-cent bucket edge exactly:
        # floor(19.99*100)=1999 -> bucket 0; floor(20.0*100)=2000 -> 1
        rows = [
            ("click", 1, 1, 19.99),
            ("click", 1, 1, 20.00),
            ("click", 1, 1, 19.98),
        ]
        sf = _write_events(tmp_path, rows)
        df = events_l_diversity(sf).to_pandas()
        # 2 distinct buckets < 3 -> flagged with n_sens == 2
        assert df.n_sens.tolist() == [2]

    def test_empty_events(self, ray_session, tmp_path):
        sf = _write_events(tmp_path, [])
        assert events_l_diversity(sf).count() == 0
        assert events_k_anonymity(sf).count() == 0


class TestDpTypeCounts:
    def test_noise_table_mean_zero_and_symmetric(self):
        from libpostal_ray.pipelines.queries import _DLAP_B2_TABLE

        t = _DLAP_B2_TABLE
        assert t.sum() == 0
        assert (t == -t[::-1]).all()  # symmetric inverse CDF
        assert (np.diff(t) >= 0).all()  # monotone (it IS a quantile table)

    def test_noise_is_deterministic_function_of_cell(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import (
            _DLAP_B2_TABLE,
            events_dp_type_counts,
        )

        # two cells with known true counts; noise must equal the table at
        # the Lehmer index of (day*8 + rank(type))
        rows = [("click", 10, 1, 1.0)] * 7 + [("view", 11, 1, 1.0)] * 4
        sf = _write_events(tmp_path, rows)
        df = (
            events_dp_type_counts(sf)
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        def expected(day, tr, n):
            cell = day * 8 + tr
            return n + int(_DLAP_B2_TABLE[((cell * 48271) % 2147483647) % 64])
        assert df.noisy_count.tolist() == [
            expected(10, 0, 7),  # click = rank 0
            expected(11, 1, 4),  # view = rank 1
        ]


class TestNgramNovelty:
    def test_first_doc_fully_novel_copy_fully_stale(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from libpostal_ray.pipelines.queries import doc_ngram_novelty

        d = tmp_path / "sf"
        d.mkdir(exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                    "text": pa.array(
                        [
                            "a b c d e",        # all grams first here
                            "a b c d e",        # exact copy: nothing novel
                            "a b c x y z",      # 'a b c' stale, rest novel
                        ],
                        type=pa.string(),
                    ),
                }
            ),
            str(d / "documents.parquet"),
        )
        df = (
            doc_ngram_novelty(str(d))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert df.n_grams.tolist() == [3, 3, 4]
        assert df.n_first.tolist() == [3, 0, 3]
        assert df.novelty.tolist() == [1.0, 0.0, 0.75]

    def test_short_docs_dropped(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from libpostal_ray.pipelines.queries import doc_ngram_novelty

        d = tmp_path / "sf"
        d.mkdir(exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], type=pa.int64()),
                    "text": pa.array(["a b", "a b c"], type=pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        df = doc_ngram_novelty(str(d)).to_pandas()
        assert df.doc_id.tolist() == [1]


class TestEventRegex:
    def test_pattern_and_ordering(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import user_event_regex

        # user 1: s c c p -> matches sc+p; user 2: s v p -> no (v breaks
        # the click run); user 3: p c s -> no (order matters)
        rows = [
            ("signup", 1, 1, 0.0), ("click", 2, 1, 0.0),
            ("click", 3, 1, 0.0), ("purchase", 4, 1, 0.0),
            ("signup", 1, 2, 0.0), ("view", 2, 2, 0.0),
            ("purchase", 3, 2, 0.0),
            ("purchase", 1, 3, 0.0), ("click", 2, 3, 0.0),
            ("signup", 3, 3, 0.0),
        ]
        sf = _write_events(tmp_path, rows)
        df = (
            user_event_regex(sf)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert df.user_id.tolist() == [1, 2, 3]
        assert df.seq_len.tolist() == [4, 3, 3]
        assert df.matched.tolist() == [1, 0, 0]

    def test_ts_tiebreak_by_event_id(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import user_event_regex

        # same ts for all rows: order falls back to event_id, which is
        # the row index in _write_events — s, c, p in insert order
        rows = [("signup", 5, 9, 0.0), ("click", 5, 9, 0.0),
                ("purchase", 5, 9, 0.0)]
        sf = _write_events(tmp_path, rows)
        df = user_event_regex(sf).to_pandas()
        assert df.matched.tolist() == [1]


class TestEmptyCorpusSweep:
    """Round-5 rows on zero-row inputs (the per-session discipline)."""

    def test_new_event_rows_on_empty(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import (
            events_dp_type_counts,
            user_event_regex,
        )

        sf = _write_events(tmp_path, [])
        assert events_dp_type_counts(sf).count() == 0
        assert user_event_regex(sf).count() == 0

    def test_novelty_and_selection_on_empty(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from libpostal_ray.pipelines.queries import doc_ngram_novelty
        from libpostal_ray.pipelines.select import coverage_select

        d = tmp_path / "sf"
        d.mkdir(exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.nulls(0, pa.int64()),
                    "text": pa.nulls(0, pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        assert doc_ngram_novelty(str(d)).count() == 0
        import ray.data as rd

        out = coverage_select(
            rd.read_parquet(f"{d}/documents.parquet"), k=3
        )
        assert out.num_rows == 0

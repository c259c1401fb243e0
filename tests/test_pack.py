"""global_prefix_sum / pack_training_sequences (pipelines/pack.py).
Corpus-scale oracle parity lives in test_oracle_parity.py (pack_sequences);
here: numpy ground truth, blocking independence, sparse/63-bit keys, the
duplicate-key guard, and degenerate inputs."""

import os
import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libpostal_ray.pipelines.pack import (  # noqa: E402
    global_prefix_sum,
    pack_training_sequences,
    token_counts,
)


def _items(keys, weights):
    return pa.table(
        {
            "k": pa.array(np.asarray(keys, dtype=np.int64)),
            "w": pa.array(np.asarray(weights, dtype=np.int64)),
        }
    )


def _run(t, **kw):
    import ray.data

    df = (
        global_prefix_sum(
            ray.data.from_arrow(t), order_col="k", weight_col="w", **kw
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    return df


class TestGlobalPrefixSum:
    def test_matches_numpy_cumsum(self, ray_session):
        rng = np.random.default_rng(7)
        keys = rng.permutation(2_000).astype(np.int64)
        weights = rng.integers(0, 1_000, size=2_000).astype(np.int64)
        df = _run(_items(keys, weights))
        order = np.argsort(keys)
        want = np.concatenate(([0], np.cumsum(weights[order])[:-1]))
        assert (df.start.to_numpy() == want).all()
        assert (df.k.to_numpy() == keys[order]).all()

    def test_blocking_independent(self, ray_session):
        import ray.data

        rng = np.random.default_rng(11)
        keys = rng.permutation(999).astype(np.int64)
        weights = rng.integers(0, 50, size=999).astype(np.int64)
        t = _items(keys, weights)
        a = _run(t)
        b = (
            global_prefix_sum(
                ray.data.from_arrow(t).repartition(13),
                order_col="k",
                weight_col="w",
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert a.values.tolist() == b.values.tolist()

    def test_sparse_63bit_keys(self, ray_session):
        # keys far above the 65536-bucket span force a real shift
        keys = np.array(
            [0, 1, 2**40, 2**40 + 1, 2**62, 2**62 + 12345], dtype=np.int64
        )
        weights = np.array([5, 7, 11, 13, 17, 19], dtype=np.int64)
        df = _run(_items(keys, weights))
        want = np.concatenate(([0], np.cumsum(weights)[:-1]))
        assert (df.start.to_numpy() == want).all()

    def test_duplicate_keys_raise(self, ray_session):
        with pytest.raises(Exception, match="duplicate order keys"):
            _run(_items([1, 2, 2], [1, 1, 1]))

    def test_negative_key_raises(self, ray_session):
        with pytest.raises(ValueError, match="must be >= 0"):
            _run(_items([-1, 2], [1, 1]))

    def test_empty(self, ray_session):
        import ray.data

        ds = global_prefix_sum(
            ray.data.from_arrow(_items([], [])), order_col="k", weight_col="w"
        )
        # zero-row to_pandas drops columns (engine gotcha) — assert on
        # the dataset schema instead
        assert ds.count() == 0
        assert set(ds.schema().names) == {"k", "w", "start"}

    def test_single_row(self, ray_session):
        df = _run(_items([42], [100]))
        assert df.start.tolist() == [0]


class TestPackSequences:
    def test_bins_and_counts(self, ray_session):
        import ray.data

        texts = ["a b c", "", "  ", "d e f g h", "x " * 600]
        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
        df = (
            pack_training_sequences(ray.data.from_arrow(t), seq_len=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert df.n_tokens.tolist() == [3, 0, 0, 5, 600]
        assert df.start_tok.tolist() == [0, 3, 3, 3, 8]
        assert df.seq_bin.tolist() == [0, 0, 0, 0, 2]

    def test_token_counts_null_text(self, ray_session):
        import ray.data

        t = pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": pa.array(["a b", None], type=pa.string()),
            }
        )
        df = token_counts(ray.data.from_arrow(t)).to_pandas()
        assert sorted(df.n_tokens.tolist()) == [0, 2]

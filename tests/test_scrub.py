"""scrub_common_tokens: corpus-adaptive boilerplate-token removal.
Corpus-scale oracle parity lives in test_oracle_parity.py
(scrub_boilerplate_tokens); here: planted fixtures with known stop sets,
order preservation, degenerate docs, and blocking independence."""

import os
import sys

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libpostal_ray.pipelines.queries import scrub_common_tokens  # noqa: E402


def _t(texts):
    return pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def _run(t, **kw):
    import ray.data

    return (
        scrub_common_tokens(ray.data.from_arrow(t), **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


class TestScrubCommonTokens:
    def test_planted_stop_set(self, ray_session):
        # "the" in 4/4 docs, "license" in 3/4 -> both >= 1/2; rare words kept
        texts = [
            "the license header of alpha",
            "the license text beta",
            "the license gamma",
            "the delta epsilon",
        ]
        df = _run(_t(texts))
        assert df.clean_text.tolist() == [
            "header of alpha",
            "text beta",
            "gamma",
            "delta epsilon",
        ]
        assert df.n_removed.tolist() == [2, 2, 2, 1]

    def test_order_preserved_with_repeats(self, ray_session):
        # stop token removed at EVERY occurrence, others keep order
        texts = ["x a x b x c", "x d", "e f"]
        df = _run(_t(texts))  # df(x)=2/3 >= 1/2 -> stop
        assert df.clean_text.tolist() == ["a b c", "d", "e f"]
        assert df.n_removed.tolist() == [3, 1, 0]

    def test_all_tokens_removed(self, ray_session):
        texts = ["common common", "common", "common rare"]
        df = _run(_t(texts))
        assert df.clean_text.tolist() == ["", "", "rare"]
        assert df.n_removed.tolist() == [2, 1, 1]

    def test_threshold_param(self, ray_session):
        # df(a)=2/3: stop at 1/2, kept at 3/4
        texts = ["a b", "a c", "d e"]
        half = _run(_t(texts), num=1, den=2)
        assert half.clean_text.tolist() == ["b", "c", "d e"]
        threeq = _run(_t(texts), num=3, den=4)
        assert threeq.clean_text.tolist() == ["a b", "a c", "d e"]

    def test_blank_and_null_docs(self, ray_session):
        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                "text": pa.array(["z z", "", None, "z q"], type=pa.string()),
            }
        )
        df = _run(t)
        # '' and NULL trim to the single token '' (df 2/4 -> stop!);
        # z in 2/4 docs -> stop
        assert df.clean_text.tolist() == ["", "", "", "q"]

    def test_blocking_independent(self, ray_session):
        import ray.data

        texts = [f"tok{i % 3} unique{i}" for i in range(60)]
        t = _t(texts)
        a = _run(t)
        b = (
            scrub_common_tokens(ray.data.from_arrow(t).repartition(7))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert a.values.tolist() == b.values.tolist()

    def test_empty_corpus(self, ray_session):
        import ray.data

        t = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
            }
        )
        ds = scrub_common_tokens(ray.data.from_arrow(t))
        assert ds.count() == 0

"""Suffix-array substring pass: kernels + pipeline."""

import numpy as np
import pyarrow as pa
import pytest

from libpostal_ray.config import PipelineConfig
from libpostal_ray.stages.substring import (
    _span_edges_for_texts,
    lcp_kasai,
    suffix_array,
)


class TestSuffixArray:
    def test_banana(self):
        s = np.frombuffer(b"banana", dtype=np.uint8).astype(np.int64)
        sa = suffix_array(s)
        # suffixes sorted: a, ana, anana, banana, na, nana
        assert list(sa) == [5, 3, 1, 0, 4, 2]

    def test_lcp(self):
        s = np.frombuffer(b"banana", dtype=np.uint8).astype(np.int64)
        sa = suffix_array(s)
        lcp = lcp_kasai(s, sa)
        # lcp between consecutive: -,1(a/ana),3(ana/anana),0,0,2(na/nana)
        assert list(lcp) == [0, 1, 3, 0, 0, 2]

    def test_matches_naive_random(self):
        rng = np.random.default_rng(3)
        s = rng.integers(0, 4, 200).astype(np.int64)
        sa = suffix_array(s)
        suffixes = sorted(range(len(s)), key=lambda i: tuple(s[i:]))
        assert list(sa) == suffixes

    def test_matches_naive_property(self):
        """Random sizes/alphabets (incl. sentinel-range values >= 256) +
        adversarial shapes; exercises both the full-streaming and
        subset-round paths of the refined-doubling SA and the crossover
        between them."""
        rng = np.random.default_rng(11)
        cases = [
            rng.integers(0, hi, size=int(rng.integers(1, 150))).astype(np.int64)
            for hi in rng.choice([2, 3, 300], size=30)
        ]
        cases += [
            np.zeros(700, np.int64),                       # single group, slow resolve
            np.tile(np.arange(5), 120).astype(np.int64),   # tandem repeats
            np.arange(400, dtype=np.int64),                # already sorted
            np.arange(400, dtype=np.int64)[::-1].copy(),   # reverse sorted
            np.array([1], dtype=np.int64),
        ]
        for s in cases:
            sa = suffix_array(s)
            tl = tuple(s.tolist())
            want = sorted(range(len(s)), key=lambda i: tl[i:])
            assert list(sa) == want, s


class TestSpanEdges:
    def test_shared_span_detected(self):
        shared = "x" * 0 + "the quick brown fox jumps over the lazy dog " * 3
        t1 = "aaa " + shared + " bbb"
        t2 = "ccc " + shared + " ddd"
        t3 = "totally unrelated content with no long overlap at all here"
        edges = _span_edges_for_texts(
            np.array([10, 20, 30], dtype=np.int64), [t1, t2, t3], 50, False
        ).to_pandas()
        pairs = set(zip(edges["src"], edges["dst"]))
        assert (10, 20) in pairs
        assert not any(30 in p for p in pairs)
        assert (edges["span_len"] >= 50).all()

    def test_no_false_span_across_docs(self):
        # sentinels prevent spans from crossing doc boundaries
        t1 = "abc" * 30
        t2 = "abc" * 30
        edges = _span_edges_for_texts(
            np.array([1, 2], dtype=np.int64), [t1, t2], 50, False
        ).to_pandas()
        assert len(edges) == 1  # genuine shared span, once

    def test_below_threshold_ignored(self):
        t1 = "shared-bit " + "u" * 30
        t2 = "shared-bit " + "v" * 30
        edges = _span_edges_for_texts(
            np.array([1, 2], dtype=np.int64), [t1, t2], 50, False
        )
        assert edges.num_rows == 0


def test_substring_pipeline(ray_session):
    from libpostal_ray.pipelines.substring import substring_pass
    from libpostal_ray.sources.readers import from_arrow_corpus

    shared = "def shared_helper(a, b):\n    return a + b * 42  # common\n" * 3
    t = pa.table(
        {
            "repo": ["r1", "r1", "r1", "r2"],
            "path": ["a.py", "b.py", "c.py", "d.py"],
            "commit": ["x"] * 4,
            "lang": ["py"] * 4,
            "content": pa.array(
                [
                    "import os\n" + shared + "print('a')\n",
                    "import sys\n" + shared + "print('b')\n",
                    "print('nothing shared here at all, completely different')\n" * 3,
                    "import re\n" + shared + "print('d')\n",
                ],
                type=pa.string(),
            ),
        }
    )
    cfg = PipelineConfig(num_partitions=1)  # single partition => all comparable
    edges = substring_pass(from_arrow_corpus(t), cfg).to_pandas()
    assert len(edges) >= 2  # a-b, a-d (anchor pairing), c excluded
    assert (edges["span_len"] >= cfg.min_span_len).all()


def test_media_plumbing(ray_session):
    import ray.data

    from libpostal_ray.stages.multimodal import (
        MediaFeatureStage,
        fake_decode,
        media_features,
        synth_media_table,
    )

    t = synth_media_table(24)
    feats = media_features(ray.data.from_arrow(t), decode_fn=fake_decode).to_pandas()
    assert len(feats) == 24
    assert set(feats.columns) == {"media_id", "media_type", "feature", "payload_bytes"}
    import numpy as np

    f0 = np.asarray(feats["feature"][0])
    assert f0.shape == (64,)
    # deterministic: same payload -> same feature
    feats2 = media_features(ray.data.from_arrow(t), decode_fn=fake_decode).to_pandas()
    assert np.array_equal(
        np.asarray(feats["feature"][5]), np.asarray(feats2["feature"][5])
    )
    # production stub raises cleanly
    import pytest as _pytest

    stage = MediaFeatureStage(decode_fn=None)
    with _pytest.raises(NotImplementedError):
        stage(t.slice(0, 2))

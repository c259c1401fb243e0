"""Greedy max-coverage data selection (pipelines/select.py) — pinned
against an independent sequential greedy over python sets."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from libpostal_ray.pipelines.select import _doc_feature_hashes, coverage_select


def _ref_greedy(texts, k, shingle_k=3):
    feats = {
        i: set(_doc_feature_hashes(t, shingle_k).tolist())
        for i, t in enumerate(texts)
    }
    covered = set()
    out = []
    for r in range(k):
        best_doc, best_marg = -1, -1
        for d in sorted(feats):
            marg = len(feats[d] - covered)
            if marg > best_marg:
                best_doc, best_marg = d, marg
        if best_doc < 0 or best_marg <= 0:
            break
        covered |= feats[best_doc]
        out.append((r, best_doc, best_marg, len(covered)))
    return out


def _ds(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    ).repartition(3)


class TestCoverageSelect:
    def test_matches_reference_random(self, ray_session):
        rng = np.random.default_rng(7)
        vocab = [f"w{i}" for i in range(12)]
        texts = [
            " ".join(rng.choice(vocab, size=int(rng.integers(4, 12))))
            for _ in range(40)
        ]
        got = coverage_select(_ds(texts), k=6).to_pandas()
        ref = _ref_greedy(texts, 6)
        assert list(
            zip(got["rank"], got.doc_id, got.marginal, got.covered_total)
        ) == ref

    def test_tie_break_smallest_id(self, ray_session):
        # docs 0 and 1 identical: greedy must pick 0 first, and 1 adds 0
        # marginal so selection stops after full coverage
        texts = ["a b c d", "a b c d", "x y z q"]
        got = coverage_select(_ds(texts), k=3).to_pandas()
        assert got.doc_id.tolist() == [0, 2]  # doc 1 never adds coverage
        assert got.marginal.tolist() == [2, 2]  # two 3-grams each

    def test_early_stop_when_covered(self, ray_session):
        texts = ["a b c", "a b c"]
        got = coverage_select(_ds(texts), k=5).to_pandas()
        assert len(got) == 1 and got.doc_id.tolist() == [0]

    def test_empty_corpus(self, ray_session):
        got = coverage_select(_ds([]), k=3).to_pandas()
        assert len(got) == 0

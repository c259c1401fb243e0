"""Round-2 regression tests: buffer-level canonicalize equivalence, the
boundary band across the short/long cutoff, the empty-edges checkpoint path,
and the rewrite-rule table."""

import numpy as np
import pyarrow as pa
import pytest

from libpostal_ray.config import PipelineConfig
from libpostal_ray.functions.canonicalize import (
    ascii_canonicalize_buffer,
    canonicalize_one,
    large_string_view,
)
from libpostal_ray.sources.readers import from_arrow_corpus
from libpostal_ray.stages.canonicalize import CanonicalizeStage


class TestBufferCanonicalize:
    def test_equivalence_random_ascii(self):
        rng = np.random.default_rng(7)
        chars = list("abcXYZ019 \t\n\r\x0b\x0c\x1c\x1f  =+(){}#")
        texts = [
            "".join(rng.choice(chars, size=int(rng.integers(0, 80))))
            for _ in range(300)
        ]
        arr = pa.array(texts, type=pa.large_string())
        data, off = large_string_view(arr)
        out, ooff = ascii_canonicalize_buffer(data, off)
        for i, t in enumerate(texts):
            got = bytes(out[ooff[i] : ooff[i + 1]]).decode()
            assert got == canonicalize_one(t), repr(t)

    def test_stage_mixed_unicode(self):
        texts = ["Hello  World", "Füße  GROß", "日本語 テスト", "", "  ", "x"]
        batch = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "content": pa.array(texts, type=pa.large_string()),
            }
        )
        res = CanonicalizeStage(PipelineConfig())(batch)
        assert res["canonical"].to_pylist() == [canonicalize_one(t) for t in texts]
        assert res["n_chars"].to_pylist() == [len(t) for t in texts]

    def test_stage_handles_nulls_and_slices(self):
        arr = pa.array(["A  b", None, "C"], type=pa.large_string())
        batch = pa.table(
            {"doc_id": pa.array([1, 2, 3], type=pa.int64()), "content": arr}
        )
        res = CanonicalizeStage(PipelineConfig())(batch)
        assert res["canonical"].to_pylist() == ["a b", "", "c"]


def test_boundary_band_pair_is_found(ray_session):
    """A near-dup pair straddling short_file_cutoff (23 vs 25 canonical
    chars) must land in one cluster — the round-1 blind spot (disjoint key
    families)."""
    from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline

    a = "abcdefghij klmnopqr uvw"        # 23 chars -> short side
    b = "abcdefghij klmnopqr uvwxy"      # 25 chars -> long side
    rows = [
        ("r0", "a.py", "c1", "py", a),
        ("r0", "b.py", "c2", "py", b),
        ("r1", "z.py", "c3", "py", "totally unrelated content here with words"),
    ]
    t = pa.table(
        {
            "repo": pa.array([r[0] for r in rows]),
            "path": pa.array([r[1] for r in rows]),
            "commit": pa.array([r[2] for r in rows]),
            "lang": pa.array([r[3] for r in rows]),
            "content": pa.array([r[4] for r in rows], type=pa.large_string()),
        }
    )
    cfg = PipelineConfig()
    assert len(a) < cfg.short_file_cutoff <= len(b)
    out = near_dupe_pipeline(from_arrow_corpus(t), cfg)
    cl = out["clusters"].to_pandas()
    by_path = {}
    docs = from_arrow_corpus(t).to_pandas()
    for _, r in docs.iterrows():
        by_path[r["path"]] = r["doc_id"]
    cid = dict(zip(cl["doc_id"], cl["cluster_id"]))
    assert cid[by_path["a.py"]] == cid[by_path["b.py"]]
    assert cid[by_path["z.py"]] != cid[by_path["a.py"]]


def test_checkpointed_pipeline_no_duplicates(ray_session, tmp_path):
    """A corpus with ZERO duplicate pairs produces all-empty edge partitions;
    the checkpointed path must not crash (ADVICE: read_parquet([]))."""
    from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline

    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    rows = []
    for i in range(12):
        body = " ".join(
            words[int(j)] + str(int(rng.integers(0, 1000)))
            for j in rng.integers(0, len(words), 30)
        )
        rows.append((f"r{i % 3}", f"f{i}.py", f"c{i}", "py", body))
    t = pa.table(
        {
            "repo": pa.array([r[0] for r in rows]),
            "path": pa.array([r[1] for r in rows]),
            "commit": pa.array([r[2] for r in rows]),
            "lang": pa.array([r[3] for r in rows]),
            "content": pa.array([r[4] for r in rows], type=pa.large_string()),
        }
    )
    cfg = PipelineConfig(num_partitions=4, verify_partitions=8)
    out = near_dupe_pipeline(
        from_arrow_corpus(t), cfg, checkpoint_dir=str(tmp_path / "ck")
    )
    cl = out["clusters"].to_pandas()
    assert len(cl) == 12
    # every doc is its own singleton cluster
    assert (cl["cluster_id"] == cl["doc_id"]).all()
    assert out["edges"].count() == 0
    # resume from the same checkpoint dir: still fine, nothing recomputed
    out2 = near_dupe_pipeline(
        from_arrow_corpus(t), cfg, checkpoint_dir=str(tmp_path / "ck")
    )
    assert out2["clusters"].count() == 12
    assert out2["metrics"]["signatures"]["computed_pids"] == []


def test_rewrite_rules_merge_variants(ray_session):
    """Rule-equivalent variants (the resources/dictionaries analog:
    'st|street') land in ONE cluster with the rule table, separate clusters
    without it."""
    from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline

    base = "street corner street light street sign street walk " * 4 + "end marker"
    variant = base.replace("street", "st")
    rows = [
        ("r0", "a.py", "c1", "py", base),
        ("r0", "b.py", "c2", "py", variant),
    ]
    t = pa.table(
        {
            "repo": pa.array([r[0] for r in rows]),
            "path": pa.array([r[1] for r in rows]),
            "commit": pa.array([r[2] for r in rows]),
            "lang": pa.array([r[3] for r in rows]),
            "content": pa.array([r[4] for r in rows], type=pa.large_string()),
        }
    )
    corpus = from_arrow_corpus(t)

    with_rules = PipelineConfig(rewrite_rules=((r"\bst\b", "street"),))
    out = near_dupe_pipeline(corpus, with_rules)
    cl = out["clusters"].to_pandas()
    assert cl["cluster_id"].nunique() == 1, "rule-equivalent docs must merge"

    out0 = near_dupe_pipeline(corpus, PipelineConfig())
    cl0 = out0["clusters"].to_pandas()
    assert cl0["cluster_id"].nunique() == 2, "without rules they stay apart"


class TestBucketCandidateIndices:
    """The skew kernel: sha-collapse + star pairs + salted sub-buckets with
    delegate-clique closure (stages/verify.bucket_candidate_indices)."""

    def _connected(self, n, li, ri):
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(li, ri):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return len({find(i) for i in range(n)})

    def _sorted_inputs(self, keys, shas, ids):
        keys = np.asarray(keys, dtype=np.int64)
        shas = np.asarray(shas, dtype=np.int64)
        ids = np.asarray(ids, dtype=np.int64)
        order = np.lexsort((ids, shas, keys))
        return keys[order], shas[order], ids[order]

    def test_identical_family_collapses_to_star(self):
        from libpostal_ray.stages.verify import bucket_candidate_indices

        cfg = PipelineConfig()
        n = 5000  # one bucket, all content-identical
        keys, shas, ids = self._sorted_inputs(
            np.zeros(n), np.full(n, 77), np.arange(n)
        )
        li, ri, trunc = bucket_candidate_indices(keys, shas, ids, cfg)
        assert li.shape[0] == n - 1, "star pairs only — linear, no blowup"
        assert not trunc
        assert self._connected(n, li, ri) == 1

    def test_hot_bucket_salted_stays_connected_and_bounded(self):
        from libpostal_ray.stages.verify import bucket_candidate_indices

        cfg = PipelineConfig(hot_bucket_cap=64, hot_sub_size=16)
        n = 1000  # distinct contents sharing one band bucket
        keys, shas, ids = self._sorted_inputs(
            np.zeros(n), np.arange(n) * 13 + 1, np.arange(n)
        )
        li, ri, trunc = bucket_candidate_indices(keys, shas, ids, cfg)
        assert not trunc
        # bounded: ~ n * sub_size / 2 + delegate clique, far below n^2/2
        assert li.shape[0] < n * cfg.hot_sub_size
        # every member is connected to the single component
        assert self._connected(n, li, ri) == 1

    def test_budget_exhaustion_degrades_with_flag(self):
        from libpostal_ray.stages.verify import bucket_candidate_indices

        cfg = PipelineConfig(
            hot_bucket_cap=8, hot_sub_size=4, salt_pair_budget=10
        )
        n = 200
        keys, shas, ids = self._sorted_inputs(
            np.zeros(n), np.arange(n) + 1, np.arange(n)
        )
        li, ri, trunc = bucket_candidate_indices(keys, shas, ids, cfg)
        assert trunc, "budget degrade must be flagged"
        assert self._connected(n, li, ri) == 1, "anchor fallback still connects"

    def test_mixed_buckets_and_groups(self):
        from libpostal_ray.stages.verify import bucket_candidate_indices

        cfg = PipelineConfig(small_bucket_cap=4, hot_bucket_cap=8, hot_sub_size=4)
        # bucket 0: two sha groups (sizes 3 and 2) -> stars + rep pair
        # bucket 1: singleton
        keys = [0, 0, 0, 0, 0, 1]
        shas = [5, 5, 5, 9, 9, 1]
        ids = [10, 11, 12, 20, 21, 30]
        k, s, i = self._sorted_inputs(keys, shas, ids)
        li, ri, trunc = bucket_candidate_indices(k, s, i, cfg)
        pairs = {tuple(sorted((int(i[a]), int(i[b])))) for a, b in zip(li, ri)}
        assert (10, 11) in pairs and (10, 12) in pairs  # star group A
        assert (20, 21) in pairs                        # star group B
        assert (10, 20) in pairs                        # representative pair
        assert (11, 20) not in pairs and (30, 10) not in pairs


def test_planted_mega_family_end_to_end(ray_session):
    """A planted 3000-member identical family clusters completely with
    linear edge work (the VERDICT salting fixture, solved by sha-collapse)."""
    from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline

    fam = "def vendored():\n    return 42\n" * 8
    rows = []
    for i in range(3000):
        rows.append((f"repo{i % 37}", f"vendor/mod{i}.py", f"c{i:08x}", "py", fam))
    rng = np.random.default_rng(11)
    vocab = [f"w{v}" for v in range(500)]
    for i in range(50):
        body = " ".join(vocab[int(j)] for j in rng.integers(0, 500, 40))
        rows.append(("other", f"u{i}.py", f"d{i:08x}", "py", body))
    t = pa.table(
        {
            "repo": pa.array([r[0] for r in rows]),
            "path": pa.array([r[1] for r in rows]),
            "commit": pa.array([r[2] for r in rows]),
            "lang": pa.array([r[3] for r in rows]),
            "content": pa.array([r[4] for r in rows], type=pa.large_string()),
        }
    )
    out = near_dupe_pipeline(from_arrow_corpus(t), PipelineConfig())
    cl = out["clusters"].to_pandas()
    sizes = cl.groupby("cluster_id").size()
    assert sizes.max() == 3000, "mega family fully clustered"
    edges = out["edges"].to_pandas()
    # linear, not quadratic: star pairs once (pair-dedup across bands)
    assert len(edges) < 3000 + 50 * 4
    assert not edges["truncated"].any()


def test_rewrite_rules_in_config_fingerprint():
    from libpostal_ray.state.checkpoint import config_fingerprint

    a = config_fingerprint(PipelineConfig())
    b = config_fingerprint(PipelineConfig(rewrite_rules=(("x", "y"),)))
    assert a != b

"""End-to-end pipeline tests on the deterministic synth corpus.

The trusted reference is a driver-side brute-force: exact char-shingle
Jaccard over all pairs at the SAME config (shingle_k, thresholds), clustered
with a plain union-find.  The pipeline must reach dup-pair recall >= 0.99
against it (BASELINE.md obligation), and preserve sha256(content) per row.
"""

import hashlib

import numpy as np
import pytest

from libpostal_ray.config import PipelineConfig
from libpostal_ray.functions.canonicalize import canonicalize_one
from libpostal_ray.functions.similarity import exact_jaccard_texts
from libpostal_ray.sources.readers import from_arrow_corpus
from libpostal_ray.synth import synth_code_corpus

CFG = PipelineConfig()


class UnionFind:
    def __init__(self):
        self.p = {}

    def find(self, x):
        p = self.p.setdefault(x, x)
        if p != x:
            self.p[x] = p = self.find(p)
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-label for determinism
            lo, hi = min(ra, rb), max(ra, rb)
            self.p[hi] = lo


def reference_dup_pairs(table, cfg: PipelineConfig):
    """Brute-force ground truth: pairs with canonical-text exact Jaccard >=
    jaccard_likely (or identical content), clustered transitively."""
    contents = table["content"].to_pylist()
    canon = [canonicalize_one(c) for c in contents]
    n = len(canon)
    uf = UnionFind()
    for i in range(n):
        uf.find(i)
    for i in range(n):
        for j in range(i + 1, n):
            if canon[i] == canon[j]:
                uf.union(i, j)
            elif (
                len(canon[i]) >= cfg.short_file_cutoff
                and len(canon[j]) >= cfg.short_file_cutoff
                and exact_jaccard_texts(canon[i], canon[j], cfg.shingle_k)
                >= cfg.jaccard_likely
            ):
                uf.union(i, j)
    comp = {}
    for i in range(n):
        comp.setdefault(uf.find(i), []).append(i)
    pairs = set()
    for members in comp.values():
        for a in range(len(members)):
            for b in range(a + 1, len(members)):
                pairs.add((members[a], members[b]))
    return pairs


@pytest.fixture(scope="module")
def corpus_table():
    return synth_code_corpus(n_files=300, seed=11, n_repos=8)


@pytest.fixture(scope="module")
def pipeline_result(ray_session, corpus_table):
    from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline

    ds = from_arrow_corpus(corpus_table)
    return near_dupe_pipeline(ds, CFG)


def test_sha256_invariant(pipeline_result, corpus_table):
    """Per-row invariant: sha256(content) survives every stage bit-exact."""
    sigs = pipeline_result["signatures"].select_columns(["doc_id", "sha256"]).to_pandas()
    from libpostal_ray.functions.hashing import stable_doc_id

    ids = stable_doc_id(
        corpus_table["repo"].to_pylist(),
        corpus_table["path"].to_pylist(),
        corpus_table["commit"].to_pylist(),
    )
    expected = {
        int(i): hashlib.sha256(c.encode()).digest()
        for i, c in zip(ids, corpus_table["content"].to_pylist())
    }
    assert len(sigs) == corpus_table.num_rows
    for i, s in zip(sigs["doc_id"], sigs["sha256"]):
        assert expected[int(i)] == bytes(s)

    # and through the final cluster table too
    clusters = pipeline_result["clusters"].select_columns(["doc_id", "sha256"]).to_pandas()
    for i, s in zip(clusters["doc_id"], clusters["sha256"]):
        assert expected[int(i)] == bytes(s)


def test_recall_vs_reference(pipeline_result, corpus_table):
    """Dup-pair recall >= 0.99 vs the brute-force reference clusters."""
    from libpostal_ray.functions.hashing import stable_doc_id

    ids = stable_doc_id(
        corpus_table["repo"].to_pylist(),
        corpus_table["path"].to_pylist(),
        corpus_table["commit"].to_pylist(),
    )
    idx_of = {int(v): i for i, v in enumerate(ids)}

    ref_pairs = reference_dup_pairs(corpus_table, CFG)
    assert len(ref_pairs) > 50, "fixture must contain real duplicate families"

    clusters = pipeline_result["clusters"].select_columns(["doc_id", "cluster_id"]).to_pandas()
    by_cluster = {}
    for d, c in zip(clusters["doc_id"], clusters["cluster_id"]):
        by_cluster.setdefault(int(c), []).append(idx_of[int(d)])
    got_pairs = set()
    for members in by_cluster.values():
        members.sort()
        for a in range(len(members)):
            for b in range(a + 1, len(members)):
                got_pairs.add((members[a], members[b]))

    recall = len(ref_pairs & got_pairs) / len(ref_pairs)
    assert recall >= 0.99, f"recall {recall:.4f} < 0.99 ({len(ref_pairs)} ref pairs)"


def test_exact_copies_share_cluster(pipeline_result, corpus_table):
    """All sha256-identical rows must land in one cluster (EXACT path)."""
    clusters = pipeline_result["clusters"].to_pandas()
    groups = {}
    for _, row in clusters.iterrows():
        groups.setdefault(bytes(row["sha256"]), set()).add(int(row["cluster_id"]))
    multi = [s for s in groups.values() if len(s) > 1]
    assert not multi, f"{len(multi)} identical-content groups split across clusters"


def test_edges_schema_and_statuses(pipeline_result):
    edges = pipeline_result["edges"].to_pandas()
    assert set(edges.columns) >= {"src", "dst", "status", "est_jaccard"}
    assert (edges["src"] < edges["dst"]).all()
    assert edges["status"].isin([3, 6, 9]).all()
    assert ((edges["est_jaccard"] >= 0) & (edges["est_jaccard"] <= 1)).all()
    # no duplicate pairs after dedup
    assert not edges.duplicated(subset=["src", "dst"]).any()


def test_refine_review_edges(ray_session):
    """Two-tier verification: a pair whose b-bit estimate lands in the review
    band but whose EXACT Jaccard clears the bar gets upgraded to LIKELY."""
    import pyarrow as pa

    from libpostal_ray.pipelines.near_dupe import (
        candidate_edges,
        refine_review_edges,
        signatures,
    )
    from libpostal_ray.stages.verify import STATUS_NEEDS_REVIEW

    # borderline pair: ~60-69% of shingles shared -> review band typically
    base = " ".join(f"tok{i:03d}" for i in range(120))
    words = base.split()
    mutated = list(words)
    for i in range(0, 120, 4):
        mutated[i] = f"zz{i:03d}"
    t = pa.table(
        {
            "repo": ["r"] * 2,
            "path": ["a", "b"],
            "commit": ["c"] * 2,
            "lang": ["txt"] * 2,
            "content": pa.array([base, " ".join(mutated)], type=pa.string()),
        }
    )
    cfg = PipelineConfig()
    corpus = from_arrow_corpus(t)
    sigs = signatures(corpus, cfg).materialize()
    edges = candidate_edges(sigs, cfg)
    refined = refine_review_edges(edges, corpus, cfg).to_pandas()
    # whatever the statuses, the refined table must carry exact_jaccard and
    # every review edge must have a real exact value computed
    assert "exact_jaccard" in refined.columns
    review_rows = refined[refined["status"] == STATUS_NEEDS_REVIEW]
    assert (review_rows["exact_jaccard"] >= 0).all()
    # exact values (where computed) must be consistent with a direct compute
    from libpostal_ray.functions.canonicalize import canonicalize_one
    from libpostal_ray.functions.similarity import exact_jaccard_texts

    if len(refined):
        direct = exact_jaccard_texts(
            canonicalize_one(base), canonicalize_one(" ".join(mutated)), cfg.shingle_k
        )
        computed = refined[refined["exact_jaccard"] >= 0]
        for v in computed["exact_jaccard"]:
            assert abs(v - direct) < 1e-9


def test_dedup_report_fused_path_on_all_unique_corpus(ray_session, tmp_path):
    """A corpus with ZERO duplicate pairs produces an EMPTY label table;
    the fused report path must still emit one keep=True/'unique' row per
    doc (np.where evaluates both branches, so the size-0 per-cluster
    gather crashed with IndexError before round 4's guard)."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from libpostal_ray.config import PipelineConfig
    from libpostal_ray.pipelines.near_dupe import dedup_report
    from libpostal_ray.sources.readers import read_code_corpus

    rng = random.Random(5)
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for i in range(120):
        rows["repo"].append("r")
        rows["path"].append(f"f{i}.py")
        rows["commit"].append("c")
        rows["lang"].append("py")
        rows["content"].append(
            " ".join(f"u{i}w{j}x{rng.randrange(10**9)}" for j in range(40))
        )
    p = str(tmp_path / "nodup.parquet")
    pq.write_table(pa.table(rows), p)
    df = dedup_report(read_code_corpus(p), PipelineConfig()).to_pandas()
    assert len(df) == 120
    assert df.keep.all()
    assert (df.reason == "unique").all()
    assert (df.n_copies == 1).all()
    assert (df.cluster_id == df.doc_id).all()

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


class TestSizeRatioGuard:
    def test_ratio_demotes_and_drops(self):
        from libpostal_ray.stages.verify import (
            STATUS_LIKELY,
            STATUS_NEEDS_REVIEW,
            verify_pair_statuses,
        )

        cfg = PipelineConfig()  # likely=0.7, review=0.5
        exact = np.array([False, False, False, True])
        raw = np.array([0.95, 0.95, 0.95, 1.0])  # est ~0.95: would be LIKELY
        both_short = np.zeros(4, dtype=bool)
        ham = np.zeros(4, dtype=np.int64)
        nsh_a = np.array([100, 100, 100, 100])
        #              ok ratio, ratio .6 (cap), ratio .3 (drop), exact wins
        nsh_b = np.array([95, 60, 30, 30])
        status, est = verify_pair_statuses(
            exact, raw, both_short, ham, cfg, nsh_a=nsh_a, nsh_b=nsh_b
        )
        assert status[0] == STATUS_LIKELY
        assert status[1] == STATUS_NEEDS_REVIEW, "ratio < likely: demoted"
        assert status[2] == 0, "ratio < review: dropped"
        assert status[3] == 9, "exact pairs unaffected by the guard"

    def test_guard_off(self):
        from libpostal_ray.stages.verify import STATUS_LIKELY, verify_pair_statuses

        cfg = PipelineConfig(size_ratio_guard=False)
        status, _ = verify_pair_statuses(
            np.array([False]),
            np.array([0.95]),
            np.zeros(1, dtype=bool),
            np.zeros(1, dtype=np.int64),
            cfg,
            nsh_a=np.array([100]),
            nsh_b=np.array([10]),
        )
        assert status[0] == STATUS_LIKELY


class TestFuzzyKernels:
    def test_dl_known(self):
        from libpostal_ray.functions.similarity import damerau_levenshtein

        assert damerau_levenshtein("kitten", "sitting") == 3
        assert damerau_levenshtein("ab", "ba") == 1  # transposition
        assert damerau_levenshtein("", "abc") == 3

    def test_jw_known(self):
        from libpostal_ray.functions.similarity import jaro_winkler

        assert abs(jaro_winkler("MARTHA", "MARHTA") - 0.9611) < 0.001
        assert jaro_winkler("same", "same") == 1.0
        assert jaro_winkler("", "x") == 0.0

    def test_reordered_doc_upgrades_via_fuzzy(self, ray_session):
        """Two docs whose shingle sets diverge (word reorder + small edits)
        but whose edit-distance similarity is high: the review band upgrades
        via the fuzzy tier."""
        from libpostal_ray.pipelines.near_dupe import refine_review_edges
        from libpostal_ray.stages.verify import (
            EDGE_SCHEMA,
            STATUS_LIKELY,
            STATUS_NEEDS_REVIEW,
        )
        import ray.data

        a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
        b = a.replace("beta", "betaX").replace("eta ", "etaY ")
        corpus = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], type=pa.int64()),
                    "content": pa.array([a, b], type=pa.large_string()),
                }
            )
        )
        edges = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([1], type=pa.int64()),
                    "dst": pa.array([2], type=pa.int64()),
                    "status": pa.array([STATUS_NEEDS_REVIEW], type=pa.int8()),
                    "est_jaccard": pa.array([0.55], type=pa.float64()),
                    "truncated": pa.array([False]),
                },
                schema=EDGE_SCHEMA,
            )
        )
        cfg = PipelineConfig()
        out = refine_review_edges(edges, corpus, cfg).to_pandas()
        row = out.iloc[0]
        # exact jaccard of the edited doc is below likely, fuzzy is high
        assert row["fuzzy_sim"] >= cfg.fuzzy_sim_likely or row["exact_jaccard"] >= cfg.jaccard_likely
        assert row["status"] == STATUS_LIKELY


def test_dedup_report(ray_session):
    """Keep/drop report: exact copies drop as exact_dup, near copies as
    near_dup, representatives kept, singletons unique."""
    from libpostal_ray.pipelines.near_dupe import dedup_report
    from libpostal_ray.synth import synth_code_corpus

    t = synth_code_corpus(n_files=300, seed=9).drop_columns(["dup_group"])
    rep = dedup_report(from_arrow_corpus(t), PipelineConfig(num_partitions=8)).to_pandas()
    assert len(rep) == 300
    assert set(rep["reason"]) <= {"unique", "kept", "exact_dup", "near_dup"}
    # exactly one keeper per cluster, and it is the min doc_id
    g = rep.groupby("cluster_id")
    assert (g["keep"].sum() == 1).all()
    keepers = rep[rep["keep"]]
    assert (keepers["doc_id"] == keepers["cluster_id"]).all()
    # singletons are 'unique', multi keepers 'kept'
    assert (rep[(rep["n_copies"] == 1)]["reason"] == "unique").all()
    assert (rep[(rep["keep"]) & (rep["n_copies"] > 1)]["reason"] == "kept").all()
    # the synth corpus plants exact copies: some must be flagged exact_dup
    assert (rep["reason"] == "exact_dup").any()
    assert (~rep["keep"] == (rep["reason"].isin(["exact_dup", "near_dup"]))).all()


def test_span_edges_merge_clusters(ray_session):
    """Two docs sharing ONLY a long exact span (low whole-file Jaccard)
    merge when cfg.span_edges=True and stay apart otherwise."""
    from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline

    shared = "this is one very long exactly repeated vendored block of text " * 4
    rng = np.random.default_rng(4)
    pad_a = " ".join(f"aw{int(x)}" for x in rng.integers(0, 1000, 300))
    pad_b = " ".join(f"bw{int(x)}" for x in rng.integers(0, 1000, 300))
    rows = [
        ("r0", "a.py", "c1", "py", pad_a + " " + shared),
        ("r0", "b.py", "c2", "py", pad_b + " " + shared),
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
    base = near_dupe_pipeline(corpus, PipelineConfig(num_partitions=4))
    assert base["clusters"].to_pandas()["cluster_id"].nunique() == 2
    spans = near_dupe_pipeline(
        corpus, PipelineConfig(span_edges=True, num_partitions=4, min_span_len=60)
    )
    assert spans["clusters"].to_pandas()["cluster_id"].nunique() == 1


def test_ann_bucketed_recall_vs_brute(ray_session):
    """Multi-table multi-probe bucketed ANN reaches recall@10 >= 0.9 vs
    brute force at bits=4, tables=4, probes=1 on the sf0.1 embeddings
    (VERDICT round-1 item 7; measured 0.945)."""
    import pyarrow.parquet as pq
    import ray.data

    from libpostal_ray.pipelines.ann import brute_force_topk, bucketed_topk

    sf = "/root/testdata/sf0.1"
    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    qt = pq.read_table(
        f"{sf}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", 20)],
    )
    qids = qt["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    qm = np.array(qt["embedding"].to_pylist(), dtype=np.float64)

    brute = brute_force_topk(emb, qm, qids, k=10).to_pandas()
    approx = bucketed_topk(
        emb, qm, qids, k=10, bits=4, probes=1, tables=4
    ).to_pandas()

    recalls = []
    for q in qids:
        truth = set(brute[brute["query_id"] == q]["vec_id"])
        got = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(truth & got) / max(1, len(truth)))
    assert np.mean(recalls) >= 0.9, f"recall@10 = {np.mean(recalls):.3f}"


def test_cc_round_checkpoint_resume(ray_session, tmp_path):
    """Distributed CC rounds checkpoint per round; a run killed after round
    0 resumes without replaying it and produces identical labels."""
    import json
    import ray.data

    from libpostal_ray.pipelines.cluster import connected_components

    rng = np.random.default_rng(17)
    # several chain components: forces multiple rounds
    edges = []
    base = 0
    for comp in range(40):
        size = int(rng.integers(3, 30))
        ids = base + np.arange(size)
        for a, b in zip(ids[:-1], ids[1:]):
            edges.append((int(a), int(b)))
        base += size + 5
    src = pa.array([e[0] for e in edges], type=pa.int64())
    dst = pa.array([e[1] for e in edges], type=pa.int64())
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))

    ref = connected_components(ds, local_max_edges=0, partitions=4).to_pandas()
    ref = ref.sort_values("doc_id").reset_index(drop=True)

    d = str(tmp_path / "cc")
    # "killed" run: only one round allowed
    connected_components(
        ds, max_rounds=1, local_max_edges=0, partitions=4, checkpoint_dir=d
    )
    man = json.load(open(f"{d}/cc_rounds/manifest.json"))
    assert set(man["rounds"]) == {"0"}
    # resumed run completes from round 1
    out = connected_components(
        ds, local_max_edges=0, partitions=4, checkpoint_dir=d
    ).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out.equals(ref)
    man2 = json.load(open(f"{d}/cc_rounds/manifest.json"))
    assert "0" in man2["rounds"] and len(man2["rounds"]) > 1
    # a fresh re-run against the converged checkpoint replays nothing new
    rounds_after = set(man2["rounds"])
    out2 = connected_components(
        ds, local_max_edges=0, partitions=4, checkpoint_dir=d
    ).to_pandas()
    assert out2.sort_values("doc_id").reset_index(drop=True).equals(ref)
    man3 = json.load(open(f"{d}/cc_rounds/manifest.json"))
    assert set(man3["rounds"]) == rounds_after


class TestAbbreviationAndSoftTfidf:
    def test_possible_abbreviation(self):
        from libpostal_ray.functions.similarity import possible_abbreviation

        assert possible_abbreviation("st", "street")
        assert possible_abbreviation("rd", "road", strict=True)
        assert not possible_abbreviation("st", "avenue")
        assert not possible_abbreviation("street", "st")  # short must be shorter
        assert not possible_abbreviation("sx", "street")
        assert not possible_abbreviation("", "road")

    def test_acronym_alignment(self):
        from libpostal_ray.functions.similarity import acronym_alignment

        assert acronym_alignment("ibm", "international business machines")
        assert acronym_alignment("international business machines", "ibm")
        assert not acronym_alignment("ibm", "big blue company")
        assert not acronym_alignment("a b", "c d")

    def test_soft_token_similarity(self):
        from libpostal_ray.functions.similarity import soft_token_similarity

        assert soft_token_similarity("main street", "main street") == 1.0
        # abbreviation-matched tokens count as matches
        assert soft_token_similarity("main st", "main street") > 0.9
        assert soft_token_similarity("alpha beta", "gamma delta") == 0.0
        # idf downweights common tokens
        idf = {"the": 0.1, "zebra": 5.0, "quay": 5.0}
        hi = soft_token_similarity("the zebra", "the zebra quay", idf)
        lo = soft_token_similarity("the zebra", "the zebra quay", None)
        assert hi != lo  # weighting is live


def test_ivf_ann_monotone_recall_and_determinism(ray_session):
    """IVF ANN: recall improves monotonically with nprobe, and the k-means
    fit is deterministic (seeded init, fixed iteration order)."""
    import pyarrow.parquet as pq
    import ray.data

    from libpostal_ray.pipelines.ann import brute_force_topk, ivf_topk, kmeans_fit

    sf = "/root/testdata/sf0.01"
    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    c1 = kmeans_fit(emb, 8, iters=4)
    c2 = kmeans_fit(emb, 8, iters=4)
    assert np.array_equal(c1, c2), "k-means must be deterministic"

    qt = pq.read_table(
        f"{sf}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", 10)],
    )
    qids = qt["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    qm = np.array(qt["embedding"].to_pylist(), dtype=np.float64)
    brute = brute_force_topk(emb, qm, qids, k=10).to_pandas()

    def recall(nprobe):
        approx = ivf_topk(
            emb, qm, qids, k=10, n_centroids=8, nprobe=nprobe, iters=4
        ).to_pandas()
        rs = []
        for q in qids:
            truth = set(brute[brute["query_id"] == q]["vec_id"])
            got = set(approx[approx["query_id"] == q]["vec_id"])
            rs.append(len(truth & got) / max(1, len(truth)))
        return float(np.mean(rs))

    r2, r8 = recall(2), recall(8)
    assert r8 >= r2, (r2, r8)
    assert r8 == 1.0, "nprobe == n_centroids scans everything -> exact"


def test_ordinal_affix_rule_pack():
    from libpostal_ray.functions.canonicalize import (
        ORDINAL_AFFIX_RULES,
        canonicalize_one,
        compile_rules,
    )

    rules = compile_rules(ORDINAL_AFFIX_RULES)
    assert (
        canonicalize_one("E 106th St", compiled_rules=rules) == "e 106 st"
    )
    assert (
        canonicalize_one("Hauptstr. 5", compiled_rules=rules)
        == "haupt strasse 5"
    )
    # no rules: untouched
    assert canonicalize_one("E 106th St") == "e 106th st"


def test_tsv_reader(ray_session, tmp_path):
    from libpostal_ray.sources.readers import read_tsv_corpus

    p = tmp_path / "corpus.tsv"
    p.write_text(
        "r0\tsrc/a.py\tc1\tpy\tdef a(): pass\n"
        "r1\tsrc/b.py\tc2\tpy\tdef b(): pass\n"
    )
    ds = read_tsv_corpus(str(p))
    df = ds.to_pandas()
    assert len(df) == 2
    assert set(df.columns) == {"doc_id", "repo", "path", "lang", "content"}
    assert df["doc_id"].nunique() == 2


def test_join_verify_path_matches_broadcast(ray_session):
    """Above sig_broadcast_max the pair verification runs as two hash joins
    instead of a broadcast lookup; forcing the threshold to 0 must produce
    identical clusters (the >3M-doc scale path, normally untestable)."""
    from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline
    from libpostal_ray.synth import synth_code_corpus

    t = synth_code_corpus(n_files=200, seed=33).drop_columns(["dup_group"])
    corpus = from_arrow_corpus(t)

    def clusters(cfg):
        out = near_dupe_pipeline(corpus, cfg)
        return (
            out["clusters"].to_pandas()[["doc_id", "cluster_id"]]
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    broadcast = clusters(PipelineConfig())
    joined = clusters(PipelineConfig(sig_broadcast_max=0))
    assert broadcast.equals(joined)


def test_physical_plans_agree(ray_session):
    """The three physical plans (manual fused exchange, sort-shuffle pairs,
    inline bucket verify) must produce IDENTICAL cluster assignments — the
    plan choice is an execution property, not a semantic one."""
    from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline
    from libpostal_ray.synth import synth_code_corpus

    t = synth_code_corpus(n_files=250, seed=21).drop_columns(["dup_group"])
    corpus = from_arrow_corpus(t)

    def clusters(cfg):
        out = near_dupe_pipeline(corpus, cfg)
        df = out["clusters"].to_pandas()[["doc_id", "cluster_id"]]
        return df.sort_values("doc_id").reset_index(drop=True)

    manual = clusters(PipelineConfig(shuffle_impl="manual"))
    sorted_ = clusters(PipelineConfig(shuffle_impl="sort"))
    inline = clusters(PipelineConfig(verify_mode="inline"))
    assert manual.equals(sorted_), "manual vs sort-shuffle divergence"
    assert manual.equals(inline), "pairs vs inline divergence"


def test_rewrite_rules_in_config_fingerprint():
    from libpostal_ray.state.checkpoint import config_fingerprint

    a = config_fingerprint(PipelineConfig())
    b = config_fingerprint(PipelineConfig(rewrite_rules=(("x", "y"),)))
    assert a != b

"""similarity_join_pairs: exact threshold self-join (pipelines/simjoin.py).
Corpus-scale oracle parity lives in test_oracle_parity.py (similar_doc_pairs);
here: plan equivalence (prefix vs exact), brute-force ground truth, prefix
pruning actually pruning, df_cap truncation, and edge/robustness cases."""

import os
import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libpostal_ray.pipelines.simjoin import (  # noqa: E402
    _postings,
    similarity_join_pairs,
)


def _fixture_table():
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    docs = [
        base,                                      # 0
        base,                                      # 1: exact copy of 0
        base.replace("iota", "IOTA"),              # 2: one token changed
        base + " phi chi psi omega",               # 3: suffix added
        "totally different words entirely here now yes",  # 4
        "alpha beta gamma delta nothing else shared with others",  # 5
        " ".join(reversed(base.split())),          # 6: same tokens, no grams
        "",                                        # 7: empty
        "one two",                                 # 8: shorter than k
    ]
    return pa.table(
        {
            "doc_id": pa.array(list(range(len(docs))), type=pa.int64()),
            "text": pa.array(docs, type=pa.string()),
        }
    )


def _brute_pairs(table: pa.Table, num: int, den: int, k: int = 3):
    ids = table["doc_id"].to_pylist()
    texts = table["text"].to_pylist()
    sets = {}
    for i, t in zip(ids, texts):
        tk = (t or "").strip().split()
        sets[i] = {
            " ".join(tk[j : j + k]) for j in range(len(tk) - k + 1)
        }
    out = set()
    for a in ids:
        for b in ids:
            if a >= b or not sets[a] or not sets[b]:
                continue
            s = len(sets[a] & sets[b])
            if s * (den + num) >= num * (len(sets[a]) + len(sets[b])):
                out.add((a, b, s, len(sets[a]), len(sets[b])))
    return out


def _run(ds, **kw):
    df = similarity_join_pairs(ds, **kw).to_pandas()
    if len(df) == 0:
        return set()
    return set(
        zip(
            df.doc_a.astype(int),
            df.doc_b.astype(int),
            df.n_shared.astype(int),
            df.n_a.astype(int),
            df.n_b.astype(int),
        )
    )


class TestSimilarityJoin:
    def test_exact_matches_brute_force(self, ray_session):
        import ray.data

        t = _fixture_table()
        want = _brute_pairs(t, 1, 2, k=3)
        got = _run(
            ray.data.from_arrow(t),
            threshold_num=1,
            threshold_den=2,
            shingle_k=3,
        )
        assert got == want
        assert (0, 1) in {(a, b) for a, b, *_ in got}  # the exact copy
        assert 4 not in {x for a, b, *_ in got for x in (a, b)}

    def test_prefix_plan_equals_exact_plan(self, ray_session):
        import ray.data

        t = _fixture_table()
        for num, den in [(1, 2), (3, 4), (1, 1)]:
            exact = _run(
                ray.data.from_arrow(t),
                threshold_num=num,
                threshold_den=den,
                shingle_k=3,
            )
            pfx = _run(
                ray.data.from_arrow(t),
                threshold_num=num,
                threshold_den=den,
                shingle_k=3,
                prefix=True,
            )
            assert pfx == exact, (num, den)
            assert exact == _brute_pairs(t, num, den, k=3), (num, den)

    def test_prefix_actually_prunes_postings(self, ray_session):
        import ray.data

        t = _fixture_table()
        full = _postings(
            ray.data.from_arrow(t),
            id_col="doc_id",
            text_col="text",
            shingle_k=3,
            partitions=8,
            threshold=None,
        ).count()
        pruned = _postings(
            ray.data.from_arrow(t),
            id_col="doc_id",
            text_col="text",
            shingle_k=3,
            partitions=8,
            threshold=(3, 4),
        ).count()
        # t=3/4 keeps |d| - ceil(0.75|d|) + 1 ~ |d|/4 of each doc's set
        assert 0 < pruned < full / 2

    def test_blocking_independence(self, ray_session):
        import ray.data

        t = _fixture_table()
        a = _run(
            ray.data.from_arrow(t), threshold_num=1, threshold_den=2
        )
        b = _run(
            ray.data.from_arrow(t).repartition(5),
            threshold_num=1,
            threshold_den=2,
        )
        assert a == b

    def test_df_cap_truncates(self, ray_session):
        import ray.data

        # every doc shares the same single gram -> one posting list of
        # df=4; df_cap below it drops the list (documented stop-shingle
        # behavior), df_cap above keeps all pairs
        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                "text": pa.array(["x y z"] * 4, type=pa.string()),
            }
        )
        full = _run(
            ray.data.from_arrow(t), threshold_num=1, threshold_den=1
        )
        assert len(full) == 6
        capped = _run(
            ray.data.from_arrow(t),
            threshold_num=1,
            threshold_den=1,
            df_cap=3,
        )
        assert capped == set()

    def test_empty_corpus(self, ray_session):
        import ray.data

        t = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
            }
        )
        df = similarity_join_pairs(ray.data.from_arrow(t)).to_pandas()
        assert len(df) == 0

    def test_negative_id_raises(self, ray_session):
        import ray.data

        t = pa.table(
            {
                "doc_id": pa.array([-1, 2], type=pa.int64()),
                "text": pa.array(["a b c d", "a b c d"], type=pa.string()),
            }
        )
        with pytest.raises(Exception, match="ids must be"):
            similarity_join_pairs(ray.data.from_arrow(t)).to_pandas()

    def test_jacc_column_is_exact_division(self, ray_session):
        import ray.data

        t = _fixture_table()
        df = similarity_join_pairs(
            ray.data.from_arrow(t), threshold_num=1, threshold_den=2
        ).to_pandas()
        got = df.jacc.to_numpy()
        want = df.n_shared.to_numpy().astype(np.float64) / (
            df.n_a.to_numpy() + df.n_b.to_numpy() - df.n_shared.to_numpy()
        )
        assert (got == want).all()


class TestBipartiteJoin:
    def _sides(self):
        left = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": pa.array(
                    [
                        "alpha beta gamma delta epsilon zeta",
                        "one two three four five six",
                        "nothing like anything else at all",
                    ],
                    type=pa.string(),
                ),
            }
        )
        right = pa.table(
            {
                "doc_id": pa.array([10, 11, 12], type=pa.int64()),
                "text": pa.array(
                    [
                        "alpha beta gamma delta epsilon zeta",   # == left 0
                        "one two three four five SIX edited",   # ~ left 1
                        "alpha beta gamma delta epsilon zeta",  # == left 0
                    ],
                    type=pa.string(),
                ),
            }
        )
        return left, right

    def test_cross_side_only(self, ray_session):
        import ray.data

        from libpostal_ray.pipelines.simjoin import similarity_join_bipartite

        left, right = self._sides()
        df = similarity_join_bipartite(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            threshold_num=1,
            threshold_den=2,
            shingle_k=3,
        ).to_pandas()
        pairs = set(zip(df.doc_a.astype(int), df.doc_b.astype(int)))
        # exact copies across sides found; the within-right duplicate
        # (10, 12) must NOT appear — sides never self-pair
        assert (0, 10) in pairs and (0, 12) in pairs
        assert (1, 11) in pairs  # partial overlap above 1/2
        assert all(a in (0, 1, 2) and b in (10, 11, 12) for a, b in pairs)

    def test_matches_brute_force(self, ray_session):
        import ray.data

        from libpostal_ray.pipelines.simjoin import similarity_join_bipartite

        left, right = self._sides()
        sets = {}
        for tbl in (left, right):
            for i, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
                tk = t.strip().split()
                sets[i] = {
                    " ".join(tk[j : j + 3]) for j in range(len(tk) - 2)
                }
        want = set()
        for a in (0, 1, 2):
            for b in (10, 11, 12):
                s = len(sets[a] & sets[b])
                if s * 3 >= 1 * (len(sets[a]) + len(sets[b])):
                    want.add((a, b))
        df = similarity_join_bipartite(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            threshold_num=1,
            threshold_den=2,
            shingle_k=3,
        ).to_pandas()
        got = set(zip(df.doc_a.astype(int), df.doc_b.astype(int)))
        assert got == want

    def test_empty_side(self, ray_session):
        import ray.data

        from libpostal_ray.pipelines.simjoin import similarity_join_bipartite

        left, _ = self._sides()
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
            }
        )
        df = similarity_join_bipartite(
            ray.data.from_arrow(left), ray.data.from_arrow(empty)
        ).to_pandas()
        assert len(df) == 0


class TestSimilarTopK:
    def test_topk_symmetric_and_ranked(self, ray_session):
        import ray.data

        import libpostal_ray.pipelines.queries as q

        df = (
            q.similar_docs_topk("/root/testdata/sf0.001")
            .to_pandas()
            .sort_values(["src_id", "rank"])
        )
        assert len(df) > 0
        # every undirected pair appears in both directions at rank >= 1
        pairs = set(zip(df.src_id, df.nbr_id))
        # rank is dense 1..k per src and jacc non-increasing within src
        for src, grp in df.groupby("src_id"):
            assert grp["rank"].tolist() == list(range(1, len(grp) + 1))
            j = grp.jacc.to_numpy()
            assert (j[:-1] >= j[1:]).all()
        assert all(
            (b, a) in pairs or (a, b) in pairs for a, b in list(pairs)[:20]
        )

"""SemDeDup (semantic dedup over embeddings) — planted-fixture tests.

Fixture geometry is exact by construction: dup-group members are tiny
perturbations of a one-hot base (within-group cosine ~0.9999); singletons
are distinct two-hot vectors (pairwise cosine in {0, 0.5}) — so at
eps=0.95 the true dup groups are unambiguous regardless of how k-means
carves the space, as long as near-identical vectors co-cluster (they
argmax to the same centroid by construction).
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from libpostal_ray.pipelines.semdedup import semantic_dedup

DIM = 16
EPS = 0.95

# planted dup groups: (first_vec_id, size, base axis)
GROUPS = [(0, 3, 0), (10, 4, 1), (20, 2, 2), (30, 6, 3)]


def _fixture_table() -> pa.Table:
    rng = np.random.RandomState(42)
    ids, vecs = [], []
    for first, size, axis in GROUPS:
        base = np.zeros(DIM)
        base[axis] = 1.0
        for j in range(size):
            v = base + rng.normal(scale=0.004, size=DIM)
            ids.append(first + j)
            vecs.append(v / np.linalg.norm(v))
    # singletons: distinct two-hot vectors over axes 4.. (never within eps
    # of each other or of any group)
    sid = 100
    for i in range(4, 12):
        for j in range(i + 1, 12):
            v = np.zeros(DIM)
            v[i] = v[j] = 1.0 / np.sqrt(2.0)
            ids.append(sid)
            vecs.append(v)
            sid += 1
    return pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32).tolist() for v in vecs],
                type=pa.list_(pa.float32()),
            ),
        }
    )


@pytest.fixture(scope="module")
def verdicts(ray_session):
    ds = ray.data.from_arrow(_fixture_table())
    df = (
        semantic_dedup(ds, eps=EPS, n_clusters=4, cluster_cap=2048)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    return df


def test_every_vector_appears_once(verdicts):
    tbl = _fixture_table()
    assert sorted(verdicts["vec_id"]) == sorted(tbl["vec_id"].to_pylist())


def test_planted_groups_keep_one_representative(verdicts):
    for first, size, _ in GROUPS:
        rows = verdicts[(verdicts.vec_id >= first) & (verdicts.vec_id < first + size)]
        assert len(rows) == size
        # whole group detected together
        assert set(rows.dup_group_size) == {size}
        assert rows.sem_cluster.nunique() == 1
        assert int(rows.keep.sum()) == 1
        # representative = lowest centroid_sim, ties by vec_id (paper rule)
        expect = rows.sort_values(["centroid_sim", "vec_id"]).iloc[0].vec_id
        assert rows[rows.keep].iloc[0].vec_id == expect
        assert not rows.truncated.any()


def test_singletons_all_kept(verdicts):
    singles = verdicts[verdicts.vec_id >= 100]
    assert (singles.dup_group_size == 1).all()
    assert singles.keep.all()


def test_deterministic(ray_session, verdicts):
    ds = ray.data.from_arrow(_fixture_table())
    again = (
        semantic_dedup(ds, eps=EPS, n_clusters=4, cluster_cap=2048)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert again.equals(verdicts)


def test_eps_above_one_keeps_everything(ray_session):
    ds = ray.data.from_arrow(_fixture_table())
    df = semantic_dedup(ds, eps=1.01, n_clusters=4).to_pandas()
    assert df.keep.all()
    assert (df.dup_group_size == 1).all()


def test_cluster_cap_truncation_is_flagged(ray_session):
    # one 6-member dup group, ONE k-means cluster, cap 3: the cluster is
    # chunked into two halves (deterministic hash order), every row is
    # flagged truncated, and each chunk keeps exactly one representative
    rng = np.random.RandomState(7)
    base = np.zeros(DIM)
    base[0] = 1.0
    vecs = [base + rng.normal(scale=0.004, size=DIM) for _ in range(6)]
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(6)), type=pa.int64()),
            "embedding": pa.array(
                [(v / np.linalg.norm(v)).astype(np.float32).tolist() for v in vecs],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    ds = ray.data.from_arrow(tbl)
    df = semantic_dedup(ds, eps=EPS, n_clusters=1, cluster_cap=3).to_pandas()
    assert df.truncated.all()
    assert int(df.keep.sum()) == 2
    # with a sufficient cap the same corpus keeps exactly one, unflagged
    df2 = semantic_dedup(ds, eps=EPS, n_clusters=1, cluster_cap=2048).to_pandas()
    assert not df2.truncated.any()
    assert int(df2.keep.sum()) == 1
    assert (df2.dup_group_size == 6).all()

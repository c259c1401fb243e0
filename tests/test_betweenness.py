"""Betweenness centrality (Brandes) — iterative graph primitive #11.

Pinned against an INDEPENDENT pure-python Brandes reference (per-source
BFS with predecessor lists — the textbook formulation, nothing shared
with the vectorized CSR sweeps)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from libpostal_ray.pipelines.graph import betweenness


def _ref_brandes(u, v):
    """Textbook Brandes over an undirected edge list; returns {node: CB}."""
    from collections import defaultdict, deque

    adj = defaultdict(list)
    for a, b in zip(u, v):
        adj[int(a)].append(int(b))
        adj[int(b)].append(int(a))
    nodes = sorted(adj)
    cb = {w: 0.0 for w in nodes}
    for s in nodes:
        stack = []
        pred = {w: [] for w in nodes}
        sigma = {w: 0.0 for w in nodes}
        dist = {w: -1 for w in nodes}
        sigma[s] = 1.0
        dist[s] = 0
        q = deque([s])
        while q:
            x = q.popleft()
            stack.append(x)
            for w in adj[x]:
                if dist[w] < 0:
                    dist[w] = dist[x] + 1
                    q.append(w)
                if dist[w] == dist[x] + 1:
                    sigma[w] += sigma[x]
                    pred[w].append(x)
        delta = {w: 0.0 for w in nodes}
        while stack:
            w = stack.pop()
            for x in pred[w]:
                delta[x] += (sigma[x] / sigma[w]) * (1.0 + delta[w])
            if w != s:
                cb[w] += delta[w]
    return {w: cb[w] / 2.0 for w in nodes}  # undirected halving


def _random_graph(rng, n=40, m=80):
    u = rng.integers(0, n, m).astype(np.int64)
    v = rng.integers(0, n, m).astype(np.int64)
    keep = u != v
    return u[keep], v[keep]


class TestBetweenness:
    def test_path_graph_known_values(self, ray_session):
        # path 0-1-2-3: CB = [0, 2, 2, 0]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "u": pa.array([0, 1, 2], type=pa.int64()),
                    "v": pa.array([1, 2, 3], type=pa.int64()),
                }
            )
        )
        df = betweenness(ds, n_sources=None).to_pandas().sort_values("doc_id")
        assert df.betweenness.tolist() == [0.0, 2.0, 2.0, 0.0]

    def test_star_graph(self, ray_session):
        # star center 0 with 4 leaves: CB[0] = C(4,2) = 6, leaves 0
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "u": pa.array([0, 0, 0, 0], type=pa.int64()),
                    "v": pa.array([1, 2, 3, 4], type=pa.int64()),
                }
            )
        )
        df = betweenness(ds, n_sources=None).to_pandas().sort_values("doc_id")
        assert df.betweenness.tolist() == [6.0, 0.0, 0.0, 0.0, 0.0]

    def test_exact_vs_reference_random(self, ray_session):
        rng = np.random.default_rng(11)
        for _ in range(5):
            u, v = _random_graph(rng)
            if u.size == 0:
                continue
            ds = ray.data.from_arrow(
                pa.table({"u": pa.array(u), "v": pa.array(v)})
            )
            df = betweenness(ds, n_sources=None).to_pandas()
            got = dict(zip(df.doc_id, df.betweenness))
            ref = _ref_brandes(u, v)
            assert set(got) == set(ref)
            for w in ref:
                assert got[w] == pytest.approx(ref[w], rel=1e-12), w

    def test_sampled_sources_subset_sum(self, ray_session):
        # with a source sample, scores = exact dependency sums over the
        # chosen sources (halved) — recompute with the reference limited
        # to the same deterministic Lehmer sample
        rng = np.random.default_rng(3)
        u, v = _random_graph(rng, n=30, m=60)
        ds = ray.data.from_arrow(pa.table({"u": pa.array(u), "v": pa.array(v)}))
        df = betweenness(ds, n_sources=5).to_pandas()
        nodes = np.unique(np.concatenate((u, v)))
        order = np.argsort((nodes * np.int64(48271)) % np.int64(2147483647),
                           kind="stable")
        chosen = set(nodes[np.sort(order[:5])].tolist())
        # reference restricted to those sources
        from collections import defaultdict, deque

        adj = defaultdict(list)
        for a, b in zip(u, v):
            adj[int(a)].append(int(b))
            adj[int(b)].append(int(a))
        cb = {int(w): 0.0 for w in nodes}
        for s in sorted(chosen):
            stack, pred = [], {int(w): [] for w in nodes}
            sigma = {int(w): 0.0 for w in nodes}
            dist = {int(w): -1 for w in nodes}
            sigma[s], dist[s] = 1.0, 0
            q = deque([s])
            while q:
                x = q.popleft()
                stack.append(x)
                for w in adj[x]:
                    if dist[w] < 0:
                        dist[w] = dist[x] + 1
                        q.append(w)
                    if dist[w] == dist[x] + 1:
                        sigma[w] += sigma[x]
                        pred[w].append(x)
            delta = {int(w): 0.0 for w in nodes}
            while stack:
                w = stack.pop()
                for x in pred[w]:
                    delta[x] += (sigma[x] / sigma[w]) * (1.0 + delta[w])
                if w != s:
                    cb[w] += delta[w]
        got = dict(zip(df.doc_id, df.betweenness))
        for w in cb:
            assert got[w] == pytest.approx(cb[w] / 2.0, rel=1e-12), w

    def test_empty(self, ray_session):
        ds = ray.data.from_arrow(
            pa.table(
                {"u": pa.nulls(0, pa.int64()), "v": pa.nulls(0, pa.int64())}
            )
        )
        out = betweenness(ds)
        assert out.count() == 0
        assert set(out.schema().names) == {"doc_id", "betweenness"}

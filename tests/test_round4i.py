"""Session-18 operators: bounded-radius weighted SSSP over the
deterministic document graph (iterative graph primitive 7).

The parity suite checks the operator against its recursive-CTE oracle;
here the independent reference is a plain heap Dijkstra over the same
edge definition, which shares nothing with either the BSP frontier
relaxation or the SQL semi-naive recursion."""

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _ref_dijkstra(sf_dir: str, d_max: int) -> dict[int, int]:
    """node -> exact shortest distance from node 1, pruned at d_max."""
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    n = tbl.num_rows
    adj: dict[int, list[tuple[int, int]]] = {}
    for doc_id, nc in zip(
        tbl["doc_id"].to_pylist(), tbl["n_chars"].to_pylist()
    ):
        k = doc_id + 1
        for tgt in (2 * k, 2 * k + 1, k + 1 + (nc % 64)):
            if tgt <= n:
                adj.setdefault(k, []).append((tgt, 1 + (k + tgt) % 3))
    dist = {1: 0}
    heap = [(0, 1)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, 1 << 62):
            continue
        for v, w in adj.get(u, ()):
            nd = d + w
            if nd <= d_max and nd < dist.get(v, 1 << 62):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    return dist


def test_sssp_matches_dijkstra(ray_session):
    from libpostal_ray.pipelines.queries import doc_graph_sssp

    out = doc_graph_sssp(SF).sort_values("doc_id")
    ref = _ref_dijkstra(SF, 48)
    assert len(out) == len(ref)
    got = dict(zip(out.doc_id.astype(int) + 1, out.dist.astype(int)))
    assert got == ref


def test_sssp_small_radius_prunes_exactly(ray_session):
    from libpostal_ray.pipelines.queries import doc_graph_sssp

    out = doc_graph_sssp(SF, d_max=6).sort_values("doc_id")
    ref = _ref_dijkstra(SF, 6)
    got = dict(zip(out.doc_id.astype(int) + 1, out.dist.astype(int)))
    assert got == ref
    assert 0 < len(got) < 500  # the radius genuinely cuts the corpus
    assert max(got.values()) <= 6


def test_sssp_empty_corpus(ray_session, tmp_path):
    from libpostal_ray.pipelines.queries import doc_graph_sssp

    d = tmp_path / "sf_empty"
    d.mkdir()
    schema = pq.read_schema(f"{SF}/documents.parquet")
    pq.write_table(schema.empty_table(), str(d / "documents.parquet"))
    out = doc_graph_sssp(str(d))
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "dist"]

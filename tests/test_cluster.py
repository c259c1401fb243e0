"""Unit tests for the distributed connected-components (large/small-star)."""

import numpy as np
import pyarrow as pa
import pytest


def _ref_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("local_path", [True, False])
@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (10, 11)],
        [(5, 1), (5, 9), (9, 20), (100, 101), (101, 102), (102, 100)],
        [(i, i + 1) for i in range(1, 50)],  # long chain: needs log rounds
        [(1, 2)],
        [(7, 3), (3, 7), (7, 3)],  # duplicates both directions
    ],
)
def test_connected_components_matches_union_find(
    ray_session, edges, local_path, monkeypatch
):
    import ray.data

    import libpostal_ray.pipelines.cluster as cl
    from libpostal_ray.pipelines.cluster import connected_components

    if not local_path:
        # force the distributed large/small-star rounds
        monkeypatch.setattr(cl, "CC_LOCAL_MAX_EDGES", 0)

    t = pa.table(
        {
            "src": pa.array([a for a, b in edges], type=pa.int64()),
            "dst": pa.array([b for a, b in edges], type=pa.int64()),
        }
    )
    labels = connected_components(ray.data.from_arrow(t), partitions=4).to_pandas()
    got = dict(zip(labels["doc_id"], labels["cluster_id"]))
    ref = _ref_components(edges)
    assert set(got) == set(ref)
    for n in ref:
        assert got[n] == ref[n], f"node {n}: {got[n]} != {ref[n]}"

"""Simulated multi-node accounting for the flagship exchange.

This sandbox is one VM, so a real 2-node run is impossible; what IS
measurable is the thing that determines multi-node behavior: the exact
bytes each exchange moves between virtual nodes under the engine's actual
hash partitioning.  We run the real exchange (same tasks, same objects) on
the 1M-file corpus, read every exchanged object's Arrow payload size, and
account them against a V-node topology (split task i -> node i mod V,
partition p -> node p mod V — round-robin, matching how Ray would spread
tasks across an evenly-sized cluster).

Outputs one JSON line: per-exchange total bytes, cross-node bytes, bytes
per doc — to be checked against the predicted table in BENCH/BASELINE.md
(pairgen ~410 B/doc, pair dedup ~17 B/pair, broadcast state ~200 B/doc).

Usage: python BENCH/exchange_volumes.py  [env: GRAFT_VNODES=2]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa

    from libpostal_ray.config import PipelineConfig
    from libpostal_ray.pipelines import near_dupe as nd
    from libpostal_ray.sources.readers import read_code_corpus

    V = int(os.environ.get("GRAFT_VNODES", "2"))
    n_files = int(os.environ.get("GRAFT_SYNTH_FILES", "1000000"))
    path = f"/tmp/libpostal_ray_bench/corpus_{n_files}_42.parquet"
    if not os.path.exists(path):
        from libpostal_ray.synth import write_synth_corpus_parallel

        os.makedirs(os.path.dirname(path), exist_ok=True)
        write_synth_corpus_parallel(path, n_files=n_files, seed=42)

    cfg = PipelineConfig()
    sigs = nd.signatures(read_code_corpus(path), cfg).materialize()
    n_docs = sigs.count()

    cpus = int(ray.cluster_resources().get("CPU", 4))
    P = max(8, min(cfg.verify_partitions, cpus * 2))
    P2 = P
    blocks = sigs.to_arrow_refs()
    n_split = max(1, min(len(blocks), cpus))
    groups = [blocks[i::n_split] for i in range(n_split)]

    split = ray.remote(num_returns=P)(nd._split_block_by_key)
    outs = [split.remote(P, *g) for g in groups]
    reduce_fn = ray.remote(num_returns=P2)(nd._pairgen_reduce)
    mid = [
        reduce_fn.remote(cfg, P2, *[outs[i][p] for i in range(len(outs))])
        for p in range(P)
    ]

    @ray.remote
    def nbytes(t: pa.Table) -> int:
        return int(t.nbytes)

    # exchange 1: split task i (node i%V) -> reduce partition p (node p%V)
    sz1 = ray.get([nbytes.remote(outs[i][p]) for i in range(n_split) for p in range(P)])
    total1 = sum(sz1)
    cross1 = sum(
        s
        for k, s in enumerate(sz1)
        if (k // P) % V != (k % P) % V
    )
    # exchange 2: reduce partition p (node p%V) -> dedup partition q (node q%V)
    sz2 = ray.get([nbytes.remote(mid[p][q]) for p in range(P) for q in range(P2)])
    total2 = sum(sz2)
    cross2 = sum(
        s
        for k, s in enumerate(sz2)
        if (k // P2) % V != (k % P2) % V
    )
    # broadcast verification state: one copy per node that runs verify tasks
    state_refs = nd._sig_state_refs(sigs)
    states = ray.get(state_refs)
    state_bytes = sum(
        sum(v.nbytes for v in st.values() if hasattr(v, "nbytes")) for st in states
    )

    out = {
        "metric": "exchange_volumes",
        "vnodes": V,
        "n_docs": n_docs,
        "pairgen_total_mb": round(total1 / 1e6, 1),
        "pairgen_cross_node_mb": round(cross1 / 1e6, 1),
        "pairgen_bytes_per_doc": round(total1 / n_docs, 1),
        "pair_dedup_total_mb": round(total2 / 1e6, 1),
        "pair_dedup_cross_node_mb": round(cross2 / 1e6, 1),
        "pair_dedup_bytes_per_doc": round(total2 / n_docs, 1),
        "broadcast_state_mb_per_node": round(state_bytes / 1e6, 1),
        "broadcast_state_bytes_per_doc": round(state_bytes / n_docs, 1),
        "expected_cross_fraction": round(1 - 1 / V, 3),
        "measured_cross_fraction_pairgen": round(cross1 / max(total1, 1), 3),
        "measured_cross_fraction_dedup": round(cross2 / max(total2, 1), 3),
    }
    ray.shutdown()
    return out


if __name__ == "__main__":
    print(json.dumps(main()))

"""Single-instance flagship control for BENCH/two_node_run.py.

Runs the identical job in one local 32-CPU Ray instance while recording the
same /proc/net/dev loopback delta.  A single raylet never routes blocks
through the object manager's TCP path, so this run's loopback delta is the
GCS + driver + heartbeat BASELINE; the two-node run's excess over it is the
real inter-object-store transfer volume.
"""

from __future__ import annotations

import argparse
import json
import time


def _lo_bytes() -> int:
    for line in open("/proc/net/dev"):
        if line.strip().startswith("lo:"):
            return int(line.split()[1])
    return -1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--corpus", default="/tmp/libpostal_ray_bench/corpus_1000000_42.parquet"
    )
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False)

    from libpostal_ray.config import PipelineConfig
    from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline
    from libpostal_ray.sources.readers import read_code_corpus

    lo_before = _lo_bytes()
    t0 = time.perf_counter()
    out = near_dupe_pipeline(read_code_corpus(args.corpus), PipelineConfig())
    n_rows = out["clusters"].count()
    wall = time.perf_counter() - t0
    lo_after = _lo_bytes()

    print(
        json.dumps(
            {
                "metric": "single_node_control",
                "nodes": 1,
                "total_cpus": args.num_cpus,
                "rows": n_rows,
                "wall_sec": round(wall, 3),
                "files_per_sec": round(n_rows / wall, 1),
                "loopback_rx_bytes_delta": lo_after - lo_before,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()

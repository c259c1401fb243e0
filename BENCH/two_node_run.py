"""Two-raylet (two-object-store) flagship run with measured cross-node traffic.

Round-3 verdict #3: the simulated 2-node exchange accounting
(BENCH/exchange_volumes.py: ~384 B/doc pairgen exchange, cross-node fraction
exactly 0.5 at 2 nodes) needed a REAL two-object-store measurement.  This
sandbox has one host, so "two nodes" = two raylets with separate plasma
stores started via the public multi-node CLI:

    ray stop
    RAY_ADDRESS= ray start --head --num-cpus=16 --port=6411 \
        --include-dashboard=false --disable-usage-stats
    RAY_ADDRESS= ray start --address=<head_ip>:6411 --num-cpus=16 \
        --disable-usage-stats

Anything that crosses raylets moves through the object manager exactly as it
would between machines (chunked push/pull over TCP), so the raylet's
cumulative ObjectManager counters ("num chunks received total" in
logs/debug_state.txt, chunk = 5 MiB max) plus /proc/net/dev loopback bytes
bound the real inter-node exchange volume.  What this cannot simulate is
per-node DRAM: both raylets share this host's ~5.5 GB/s memory wall, so wall
time is compared against the single-instance T32 record, not against an
idealized 2x.

Usage (cluster already up, see above):
    python BENCH/two_node_run.py --address <head_ip>:6411 \
        --corpus /tmp/libpostal_ray_bench/corpus_1000000_42.parquet
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re
import time


DEBUG_STATE = "/tmp/ray/ray/session_latest/logs/debug_state.txt"


def _sample_chunks() -> tuple[str, int] | None:
    """One (node_id, cumulative chunks received) sample.  `ray start
    --temp-dir` is head-only, so BOTH raylets alternate writing the same
    debug_state.txt every ~10 s; the dump's leading `Node ID:` attributes
    each snapshot."""
    try:
        txt = open(DEBUG_STATE).read()
    except OSError:
        return None
    nid = re.search(r"Node ID: ([0-9a-f]+)", txt)
    m = re.search(r"num chunks received total: (\d+)", txt)
    if not (nid and m):
        return None
    return nid.group(1)[:12], int(m.group(1))


def _poll_chunks(seconds: float) -> dict[str, int]:
    """Poll debug_state for `seconds`, keeping the max (counters are
    cumulative) per node id seen."""
    out: dict[str, int] = {}
    deadline = time.monotonic() + seconds
    while time.monotonic() < deadline:
        s = _sample_chunks()
        if s:
            out[s[0]] = max(out.get(s[0], 0), s[1])
        time.sleep(0.5)
    return out


def _lo_bytes() -> int:
    """Cumulative loopback RX bytes (object-manager TCP between the two
    raylets rides lo on a single host)."""
    for line in open("/proc/net/dev"):
        if line.strip().startswith("lo:"):
            return int(line.split()[1])
    return -1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--address", required=True)
    ap.add_argument(
        "--corpus", default="/tmp/libpostal_ray_bench/corpus_1000000_42.parquet"
    )
    ap.add_argument("--output", default="/tmp/two_node_out")
    args = ap.parse_args()

    import ray

    # a ray-start cluster's workers don't inherit the driver's sys.path;
    # ship the repo root the same way `ray job submit` would
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    ray.init(
        address=args.address,
        include_dashboard=False,
        runtime_env={"env_vars": {"PYTHONPATH": repo}},
    )
    nodes = [n for n in ray.nodes() if n["Alive"]]
    assert len(nodes) == 2, f"expected 2 alive nodes, got {len(nodes)}"
    cpus = int(ray.cluster_resources().get("CPU", 0))

    # one full dump cycle (~10 s/node, alternating) for the "before" counters
    before = _poll_chunks(25)
    lo_before = _lo_bytes()

    from libpostal_ray.config import PipelineConfig
    from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline
    from libpostal_ray.sources.readers import read_code_corpus

    t0 = time.perf_counter()
    out = near_dupe_pipeline(read_code_corpus(args.corpus), PipelineConfig())
    n_rows = out["clusters"].count()
    wall = time.perf_counter() - t0

    # raylets dump debug_state every ~10 s, alternating writers; poll past
    # one full cycle so both nodes land a post-job snapshot
    after = _poll_chunks(25)
    lo_after = _lo_bytes()

    chunk = 5 * 1024 * 1024
    received = {
        k: {
            "chunks": after[k] - before.get(k, 0),
            "bytes_upper_bound": (after[k] - before.get(k, 0)) * chunk,
        }
        for k in after
    }
    print(
        json.dumps(
            {
                "metric": "two_node_flagship",
                "nodes": 2,
                "total_cpus": cpus,
                "corpus": args.corpus,
                "rows": n_rows,
                "wall_sec": round(wall, 3),
                "files_per_sec": round(n_rows / wall, 1),
                "object_manager_received": received,
                "loopback_rx_bytes_delta": lo_after - lo_before,
                "note": "chunks*5MiB is an upper bound (last chunk partial); "
                "loopback delta includes GCS/heartbeat chatter",
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()

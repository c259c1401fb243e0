"""Two-raylet 2->8 scaling suite (round-5 verdict directive #7).

The in-process scaling suites (bench.py --scaling) measure N vs 4N CPUs
inside ONE raylet; the round-4 two-raylet run measured the dual-store
overhead only at T32-equivalent width (1.31x the single-instance wall).
This harness closes the gap: the SAME 2->8 suite, but each leg runs on
the two-raylet topology (2 = 2 raylets x 1 CPU, 8 = 2 raylets x 4 CPUs,
separate plasma stores, real object-manager transfers between them), so
the efficiency number is comparable to the in-process suites while every
leg pays the cross-store tax a real cluster pays.

Method (the repo's interleaved best-of-N discipline):
  * legs interleave (1, 4, 1, 4 cpus/raylet) so a host-load window hits
    both legs equally;
  * each leg: `ray stop` -> `ray start --head --num-cpus=N` +
    `ray start --address=... --num-cpus=N` -> fresh subprocess driver
    runs the 1M-file flagship -> wall recorded -> `ray stop`;
  * efficiency = wall_2 / (4 * wall_8), best-of-reps per leg.

Usage: python BENCH/two_raylet_scaling.py [n_files] [reps]
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

REPO = str(pathlib.Path(__file__).resolve().parent.parent)
PORT = 6413
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

DRIVER = r"""
import json, time, sys
import ray
ray.init(address=sys.argv[1], include_dashboard=False,
         runtime_env={"env_vars": {"PYTHONPATH": sys.argv[3]}},
         logging_level="ERROR")
nodes = [n for n in ray.nodes() if n["Alive"]]
assert len(nodes) == 2, f"expected 2 raylets, got {len(nodes)}"
cpus = int(ray.cluster_resources().get("CPU", 0))
sys.path.insert(0, sys.argv[3])
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from libpostal_ray.config import PipelineConfig
from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline
from libpostal_ray.sources.readers import read_code_corpus
t0 = time.perf_counter()
out = near_dupe_pipeline(read_code_corpus(sys.argv[2]), PipelineConfig())
rows = out["clusters"].count()
wall = time.perf_counter() - t0
print(json.dumps({"wall": wall, "rows": rows, "cpus": cpus}))
ray.shutdown()
"""


def _sh(cmd: list[str]) -> None:
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    subprocess.run(cmd, check=False, env=env, capture_output=True)


def corpus_path() -> str:
    path = f"/tmp/libpostal_ray_bench/corpus_{N}_42.parquet"
    if not os.path.exists(path):
        sys.path.insert(0, REPO)
        import ray

        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
        from libpostal_ray.synth import write_synth_corpus_parallel

        os.makedirs(os.path.dirname(path), exist_ok=True)
        write_synth_corpus_parallel(path, n_files=N, seed=42)
        ray.shutdown()
        _sh(["ray", "stop", "--force"])
    return path


def run_leg(cpus_per_raylet: int, corpus: str) -> dict:
    _sh(["ray", "stop", "--force"])
    time.sleep(2)
    _sh([
        "ray", "start", "--head", f"--num-cpus={cpus_per_raylet}",
        f"--port={PORT}", "--include-dashboard=false",
        "--disable-usage-stats",
    ])
    _sh([
        "ray", "start", f"--address=127.0.0.1:{PORT}",
        f"--num-cpus={cpus_per_raylet}", "--disable-usage-stats",
    ])
    time.sleep(3)
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    env["PYTHONPATH"] = REPO
    out = subprocess.run(
        [sys.executable, "-c", DRIVER, f"127.0.0.1:{PORT}", corpus, REPO],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    _sh(["ray", "stop", "--force"])
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not line:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(line[-1])


def main() -> None:
    corpus = corpus_path()
    walls: dict[int, list[float]] = {1: [], 4: []}
    rows_seen = set()
    for rep in range(REPS):
        for cpr in (1, 4):
            got = run_leg(cpr, corpus)
            walls[cpr].append(got["wall"])
            rows_seen.add(got["rows"])
            print(
                f"rep{rep} 2x{cpr}cpu (total {got['cpus']}): "
                f"{got['wall']:.2f} s ({got['rows']} rows)",
                flush=True,
            )
    assert len(rows_seen) == 1, f"row counts diverged: {rows_seen}"
    w2, w8 = min(walls[1]), min(walls[4])
    eff = w2 / (4.0 * w8)
    print(json.dumps({
        "metric": "two_raylet_scaling_2_to_8",
        "n_files": N,
        "wall_2cpu_best": round(w2, 2),
        "wall_8cpu_best": round(w8, 2),
        "walls_2cpu": [round(w, 2) for w in walls[1]],
        "walls_8cpu": [round(w, 2) for w in walls[4]],
        "efficiency": round(eff, 3),
        "topology": "2 raylets x {1,4} CPUs, separate plasma stores",
    }))


if __name__ == "__main__":
    main()
